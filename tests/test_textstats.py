

def test_cooccurrence_counts_hand_pairs(spark):
    """Hand corpus: ordered pairs inside the window only; marginals count
    every token occurrence; min_count prunes; window validates."""
    import pytest

    from kgforge.functions.textstats import cooccurrence_counts

    docs = [
        (1, "a b c a b"),
        (2, "a b"),
        (3, "solo"),          # single token: contributes nothing
        (4, None),            # null text: dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccurrence_counts(df, window=2, min_count=1)
    got = {(r.w1, r.w2): (r.cooc, r.cnt1, r.cnt2) for r in out.collect()}
    # doc1 pairs (w=2): ab ac | bc ba | ca cb | ab ; doc2: ab
    assert got[("a", "b")] == (3, 3, 3)
    assert got[("a", "c")] == (1, 3, 1)
    assert got[("b", "c")] == (1, 3, 1)
    assert got[("b", "a")] == (1, 3, 3)
    assert got[("c", "a")] == (1, 1, 3)
    assert got[("c", "b")] == (1, 1, 3)
    assert len(got) == 6  # 'solo' and the null row contribute nothing
    # ordered: (b, a) != (a, b); min_count prunes everything below 3
    pruned = cooccurrence_counts(df, window=2, min_count=3)
    assert {(r.w1, r.w2) for r in pruned.collect()} == {("a", "b")}
    with pytest.raises(ValueError):
        cooccurrence_counts(df, window=0)


def test_textrank_ranks_hub_word_highest(spark):
    """A word co-occurring with everything outranks peripheral words;
    string node ids flow through the scaled PageRank unchanged."""
    from kgforge.functions.textstats import textrank_keywords

    docs = [
        (1, "core alpha core beta core gamma"),
        (2, "core delta core epsilon"),
        (3, "alpha beta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.w: r.rank for r in textrank_keywords(df, window=2, min_cooc=1, n_iter=3).collect()}
    assert out, "graph should be non-empty"
    top = max(out, key=out.get)
    assert top == "core"
    assert all(isinstance(v, int) for v in out.values())


# ---------------------------------------------------------------------
# RAKE word statistics (r5 s7)
# ---------------------------------------------------------------------


def test_rake_textbook_phrases(spark):
    from kgforge.functions.textstats import rake_word_scores

    d = spark.createDataFrame(
        [(1, "deep learning of deep nets and fast learning")],
        "doc_id long, text string",
    )
    got = {
        r.word: (r.freq, r.deg) for r in rake_word_scores(d).collect()
    }
    # phrases: [deep learning], [deep nets], [fast learning]
    assert got == {
        "deep": (2, 4),
        "learning": (2, 4),
        "nets": (1, 2),
        "fast": (1, 2),
    }


def test_rake_non_alpha_delimits_and_phrases_stop_at_doc_edges(spark):
    from kgforge.functions.textstats import rake_word_scores

    d = spark.createDataFrame(
        [(1, "alpha beta 42 gamma"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    got = {
        r.word: (r.freq, r.deg) for r in rake_word_scores(d).collect()
    }
    # '42' delimits doc 1; phrases never span documents
    assert got["alpha"] == (1, 2) and got["beta"] == (1, 2)
    assert got["gamma"] == (2, 3)  # singleton phrase + [gamma delta]
    assert got["delta"] == (1, 2)


def test_rake_no_python_in_plan(spark):
    from kgforge.functions.textstats import rake_word_scores

    d = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = (
        rake_word_scores(d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------
# Kneser-Ney bigram counts (r5 s7)
# ---------------------------------------------------------------------


def test_kn_counts_hand_computed(spark):
    from kgforge.functions.textstats import kn_bigram_counts

    d = spark.createDataFrame([(1, "a b a b a c")], "doc_id long, text string")
    got = {
        (r.w1, r.w2): (r.c, r.c_left, r.n_right, r.n_left, r.n_bigrams)
        for r in kn_bigram_counts(d).collect()
    }
    assert got == {
        ("a", "b"): (2, 3, 2, 1, 3),
        ("b", "a"): (2, 2, 1, 1, 3),
        ("a", "c"): (1, 3, 2, 1, 3),
    }


def test_kn_prob_mass_sums_to_one(spark):
    import math

    from kgforge.functions.textstats import kn_bigram_counts, kn_prob

    d = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat ran to the mat")],
        "doc_id long, text string",
    )
    D = 0.75
    rows = kn_prob(kn_bigram_counts(d), discount=D).collect()
    # for every context w1: seen-mass + lambda * unseen-continuation
    # mass must equal exactly 1
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.w1, []).append(r)
    for w1, ctx_rows in by_ctx.items():
        c_left = ctx_rows[0].c_left
        n_right = ctx_rows[0].n_right
        n_big = ctx_rows[0].n_bigrams
        lam = D * n_right / c_left
        seen = sum(r.p_kn for r in ctx_rows)
        seen_cont = sum(r.n_left for r in ctx_rows) / n_big
        assert math.isclose(seen + lam * (1 - seen_cont), 1.0,
                            rel_tol=1e-12), w1


def test_kn_counts_doc_boundaries_not_crossed(spark):
    from kgforge.functions.textstats import kn_bigram_counts

    d = spark.createDataFrame(
        [(1, "x y"), (2, "y z")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2) for r in kn_bigram_counts(d).collect()}
    assert got == {("x", "y"), ("y", "z")}  # no (y, y) bridge
