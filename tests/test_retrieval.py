"""Lexical retrieval (functions/retrieval.py): inverted-index statistics
exactness, BM25 parity vs an independent pure-Python reference, and the
plan shapes that make it scale (broadcast idf, no Python on the data
plane)."""

from __future__ import annotations

import pytest

from kgforge.functions.retrieval import (
    bm25_reference,
    bm25_topk,
    term_stats,
    top_docs_per_term,
)

DOCS = [
    (0, "spark shuffles the big join keys"),
    (1, "spark spark spark broadcast join"),
    (2, "duckdb runs the oracle sql"),
    (3, "the the the the filler document with many the"),
    (4, "broadcast the small side of a join"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_term_stats_exact_counts(spark):
    tf, dfreq = term_stats(_df(spark))
    tf_map = {(r.doc_id, r.term): r.tf for r in tf.collect()}
    assert tf_map[(1, "spark")] == 3
    assert tf_map[(3, "the")] == 5
    assert (5, "") not in tf_map and all(t != "" for _, t in tf_map)
    d = {r.term: (r.df, r.corpus_tf) for r in dfreq.collect()}
    assert d["spark"] == (2, 4)
    assert d["join"] == (3, 3)
    assert d["the"] == (4, 8)


def test_top_docs_per_term_ranking_and_ties(spark):
    out = top_docs_per_term(_df(spark), ["the", "spark"], k=2)
    rows = {(r.term, r.doc_id): (r.tf, r.df, r.corpus_tf)
            for r in out.collect()}
    # 'the': doc 3 has tf=5, then tie tf=1 broken by doc_id -> doc 0
    assert set(k[1] for k in rows if k[0] == "the") == {3, 0}
    assert rows[("the", 3)] == (5, 4, 8)
    assert rows[("spark", 1)] == (3, 2, 4)


def test_bm25_matches_pure_python_reference(spark):
    got = bm25_topk(_df(spark), "spark join", k=10).collect()
    want = bm25_reference([(i, t) for i, t in DOCS], "spark join", k=10)
    assert [r.doc_id for r in got] == [i for i, _ in want]
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-12)


def test_bm25_query_term_set_semantics(spark):
    """Duplicate query terms count once (documented Lucene-like set
    semantics)."""
    a = bm25_topk(_df(spark), "spark spark join", k=10).collect()
    b = bm25_topk(_df(spark), "spark join", k=10).collect()
    assert [(r.doc_id, r.score) for r in a] == [
        (r.doc_id, r.score) for r in b
    ]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), "   ")


def test_bm25_plan_shape(spark):
    """The idf side is broadcast, nothing on the data plane drops to
    Python, and no cartesian/nested-loop join appears (the only
    crossJoin is the broadcast 1-row constants)."""
    plan = (
        bm25_topk(_df(spark), "spark join", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_build_postings_sorted_and_blocked(spark):
    from kgforge.functions.retrieval import build_postings

    whole = {
        r.term: (list(r.postings), r.df, r.corpus_tf)
        for r in build_postings(_df(spark)).collect()
    }
    ps, dfreq, ctf = whole["the"]
    assert [p.doc_id for p in ps] == [0, 2, 3, 4]  # doc_id-sorted
    assert {(p.doc_id, p.tf) for p in ps} >= {(3, 5), (0, 1)}
    assert (dfreq, ctf) == (4, 8)
    # blocking: block_size=2 shards 'the' into 2 blocks that reassemble
    blocked = [
        r
        for r in build_postings(_df(spark), block_size=2).collect()
        if r.term == "the"
    ]
    blocked.sort(key=lambda r: r.block)
    assert [r.block for r in blocked] == [0, 1]
    reassembled = [p.doc_id for r in blocked for p in r.postings]
    assert reassembled == [0, 2, 3, 4]
    # per-term totals ride on every block
    assert all((r.df, r.corpus_tf) == (4, 8) for r in blocked)
    import pytest as _pt
    with _pt.raises(ValueError):
        build_postings(_df(spark), block_size=0)


def _phrase(spark, docs, phrase):
    from kgforge.functions.retrieval import phrase_search

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in phrase_search(df, phrase).collect()
    }


def test_phrase_search_basic_and_case(spark):
    out = _phrase(
        spark,
        [
            (0, "Big Join keys and big join again"),
            (1, "join big"),                 # reversed order: no hit
            (2, "big x join"),               # gap: no hit
            (3, "big join"),
        ],
        "big join",
    )
    assert out == {0: (2, 1), 3: (1, 1)}


def test_phrase_search_overlapping_self_repeat(spark):
    # 'batch batch' in 'batch batch batch' hits at starts 1 AND 2
    out = _phrase(spark, [(0, "batch batch batch")], "batch batch")
    assert out == {0: (2, 1)}


def test_phrase_search_repeated_term_needs_both_positions(spark):
    # phrase 'the data the': doc 0 has it, doc 1 only 'the data'
    out = _phrase(
        spark,
        [(0, "x the data the y"), (1, "the data x the")],
        "the data the",
    )
    assert out == {0: (1, 2)}


def test_phrase_search_single_term_and_empty(spark):
    out = _phrase(spark, [(0, "a b a"), (1, "c")], "a")
    assert out == {0: (2, 1)}
    with pytest.raises(ValueError):
        _phrase(spark, [(0, "a")], "   ")


def test_phrase_search_plan_has_no_python(spark):
    from kgforge.functions.retrieval import phrase_search

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = phrase_search(df, "a b")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
