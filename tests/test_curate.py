"""Corpus-curation funnel (functions/curate.py): accountable drops through
language -> quality -> exact-dup -> near-dup-cluster stages."""

from __future__ import annotations

import random

from kgforge.functions.curate import curate_documents


def _corpus(spark):
    rng = random.Random(3)
    words = [
        "the", "of", "and", "research", "harbor", "signal", "window",
        "garden", "travel", "stone", "river", "music",
    ]
    rows = []
    # clean english docs
    for i in range(10):
        body = " ".join(rng.choice(words) for _ in range(40))
        rows.append((i, f"the of and {body}"))
    # near-dup cluster: 20 <- 21 <- 22 one-word mutations of a fresh text
    base = ("the of and " + " ".join(
        rng.choice(words) for _ in range(40)
    )).split()
    for j, did in enumerate((20, 21, 22)):
        toks = list(base)
        if j:
            toks[10 + j] = f"zz{j}"
        rows.append((did, " ".join(toks)))
    # exact duplicate of doc 1 (case/whitespace variant)
    rows.append((30, rows[1][1].upper().replace(" ", "  ")))
    # non-english
    rows.append((40, "zxq pqr mnl trk vsn wrd qpt lmn"))
    # too short
    rows.append((41, "the of and"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_funnel_reasons_and_kept(spark):
    df = _corpus(spark)
    kept, audit = curate_documents(
        df, minhash_kwargs={"threshold_num": 8, "threshold_den": 10}
    )
    reasons = {r.id: r.reason for r in audit.collect()}
    kept_ids = {r.doc_id for r in kept.collect()}
    assert reasons[40] == "lang"
    assert reasons[41] == "quality"
    assert reasons[30] == "exact_dup"
    # near-dup cluster keeps its min id (20); mutations drop
    assert reasons[21] == "near_dup" and reasons[22] == "near_dup"
    assert 20 in kept_ids
    # audit + kept partition the input exactly
    all_ids = {r.doc_id for r in df.collect()}
    assert kept_ids | set(reasons) == all_ids
    assert not (kept_ids & set(reasons))


def test_sql_expressible_variant_skips_lsh(spark):
    df = _corpus(spark)
    kept, audit = curate_documents(df, near_dup=False)
    reasons = {r.reason for r in audit.collect()}
    assert "near_dup" not in reasons
    # the near-dup mutations survive without the LSH stage
    assert {20, 21, 22} <= {r.doc_id for r in kept.collect()}


def test_repetition_stats_semantics(spark):
    """Gopher-style repetition signals: duplicate lines and top-bigram
    dominance, with <2-token and NULL-text edge cases."""
    from kgforge.functions.textstats import repetition_stats

    rows = [
        # 4 lines, 2 distinct; 'click here' dominates the bigrams
        (1, "click here\nclick here\nbuy now\nclick here"),
        # no repetition: every line and bigram unique
        (2, "alpha beta\ngamma delta"),
        # single token: no bigrams
        (3, "word"),
        # empty text: one (empty) line, no bigrams
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in repetition_stats(df).collect()
    }
    r1 = out[1]
    # lines: ['click here', 'click here', 'buy now', 'click here']
    assert (r1.n_lines, r1.n_distinct_lines) == (4, 2)
    # tokens: click here click here buy now click here -> 7 bigrams,
    # 'here click' x2 and 'click here' x3 -> top = 3
    assert (r1.n_bigrams, r1.top_bigram_n) == (7, 3)
    r2 = out[2]
    assert (r2.n_lines, r2.n_distinct_lines) == (2, 2)
    assert (r2.n_bigrams, r2.top_bigram_n) == (3, 1)
    assert (out[3].n_bigrams, out[3].top_bigram_n) == (0, 0)
    assert (out[4].n_lines, out[4].n_distinct_lines) == (1, 1)
    assert (out[4].n_bigrams, out[4].top_bigram_n) == (0, 0)
    assert out[5].n_lines is None and out[5].n_bigrams == 0


def test_canonical_url_rules(spark):
    """Each canonicalization rule, plus the not-a-URL passthrough."""
    from pyspark.sql import functions as F

    from kgforge.functions.scrub import canonical_url

    cases = {
        "HTTP://WWW.Example.COM:80/Path/?utm_source=x&id=3&gclid=z#f":
            "https://example.com/Path?id=3",
        "https://example.com:443/": "https://example.com",
        "https://example.com": "https://example.com",
        "http://example.com/a/?utm_campaign=c": "https://example.com/a",
        # path case is preserved (RFC 3986: only scheme/host fold)
        "https://Sub.Example.com/CaseSensitive/PATH":
            "https://sub.example.com/CaseSensitive/PATH",
        # ref param stripped mid-query, separators tidied
        "https://example.com/x?a=1&ref=tw&b=2":
            "https://example.com/x?a=1&b=2",
        "not a url": "not a url",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url(F.col("url")).alias("c"))
        .collect()
    }
    assert got == cases


def test_scrub_pii_counts_and_redaction(spark):
    from kgforge.functions.scrub import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.org and d@e.io, ip 10.0.0.1, "
                "call +1 (415) 555-0123 now"),
            (2, "no pii, just 3.14 and version 1.2.3 and year 2024"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    r1 = out[1]
    assert (r1.n_emails, r1.n_ipv4, r1.n_phones) == (2, 1, 1)
    assert r1.text_clean == (
        "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE> now"
    )
    r2 = out[2]
    # 1.2.3 is not an IPv4 (3 octets); 3.14 / 2024 untouched
    assert (r2.n_emails, r2.n_ipv4, r2.n_phones) == (0, 0, 0)
    assert r2.text_clean == df.collect()[1].text


def test_funnel_repetition_gate_and_scrub(spark):
    """Optional stages: Gopher-style repetition thresholds drop spammy
    docs with reason 'repetition'; scrub=True rewrites kept text."""
    rows = [
        (1, "the of and research harbor signal window garden travel "
            "stone river music extra words here to pass the gates"),
        # top-bigram dominated: 'click here' is most of the bigrams
        (2, "the of and " + "click here " * 10),
        # duplicate lines dominate (4 of 5 lines are copies: 60% > 50%)
        (3, "the of and alpha beta\nthe of and alpha beta\n"
            "the of and alpha beta\nthe of and alpha beta\n"
            "unique closing line of text"),
        # clean doc carrying PII to scrub
        (4, "the of and contact sam.lee@corp.example.com at 10.1.2.3 "
            "for the research signal music garden data"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept, audit = curate_documents(
        df,
        max_dup_line_pct=50,
        max_top_bigram_pct=30,
        scrub=True,
        near_dup=False,
    )
    reasons = {r.id: r.reason for r in audit.collect()}
    assert reasons == {2: "repetition", 3: "repetition"}
    kept_rows = {r.doc_id: r.text for r in kept.collect()}
    assert set(kept_rows) == {1, 4}
    assert "<EMAIL>" in kept_rows[4] and "<IP>" in kept_rows[4]
    assert "sam.lee" not in kept_rows[4]
    assert kept.columns == ["doc_id", "text"]


def test_canonical_url_idempotent_on_generated_soup(spark):
    """Canonicalization must be a projection: canon(canon(u)) ==
    canon(u) over a generated soup of scheme/case/port/param/fragment
    combinations (one pass, the violation filter must be empty)."""
    import random

    from pyspark.sql import functions as F

    from kgforge.functions.scrub import canonical_url

    rng = random.Random(7)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://"]
    hosts = ["example.com", "WWW.Example.COM", "sub.ex.org:443",
             "ex.org:80", "ex.org:8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/x%20y/"]
    queries = ["", "?utm_source=a", "?id=1&utm_medium=m&b=2",
               "?fbclid=z", "?ref=tw&gclid=q&keep=1", "?a=1&&b=2"]
    frags = ["", "#top", "#a?b=c"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
        + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ] + ["not a url", "", "ftp://weird.example/x?utm_source=1"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url"))
    out = df.select("url", once.alias("c1")).withColumn(
        "c2", canonical_url(F.col("c1"))
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], [
        (r.url, r.c1, r.c2) for r in bad[:5]
    ]


def test_ngram_contamination_semantics(spark):
    """Exact word-13-gram overlap: a doc containing a benchmark span is
    flagged with the right shared count; near misses are not."""
    from kgforge.functions.dedup import ngram_contamination

    span = "one two three four five six seven eight nine ten " \
           "eleven twelve thirteen"
    docs = spark.createDataFrame(
        [
            (1, f"prefix words here {span} suffix words"),
            # 12-of-13 overlap (one word changed): NOT contaminated
            (2, f"prefix {span.replace('seven', 'SEVEN7')} suffix"),
            (3, "completely unrelated text with many distinct tokens "
                "spread over enough words to shingle"),
            # case-insensitive match
            (4, span.upper()),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, span)], "bench_id bigint, text string"
    )
    got = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in ngram_contamination(docs, bench, n=13).collect()
    }
    assert got == {(1, 100): 1, (4, 100): 1}
    # n=5 finds the partial overlap in doc 2 too (prefix + suffix runs)
    got5 = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in ngram_contamination(docs, bench, n=5).collect()
    }
    assert (2, 100) in got5 and got5[(1, 100)] == 9


def test_funnel_decontamination_stage(spark):
    """bench= drops contaminated docs with reason 'contaminated' before
    dedup; clean docs flow through."""
    span = "one two three four five six seven eight nine ten " \
           "eleven twelve thirteen"
    docs = spark.createDataFrame(
        [
            (1, "the of and research harbor signal window garden "
                "travel stone river music data"),
            (2, f"the of and leaked benchmark span {span} end padding"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(9, span)], "bench_id bigint, text string"
    )
    kept, audit = curate_documents(docs, bench=bench, near_dup=False)
    assert {r.doc_id for r in kept.collect()} == {1}
    assert {(r.id, r.reason) for r in audit.collect()} == {
        (2, "contaminated")
    }


def test_zipf_model_ranks_and_cap(spark):
    """Ranks follow (count DESC, token ASC); top_n truncates the tail."""
    from kgforge.functions.textstats import zipf_rank_model

    ref = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a z")], "doc_id bigint, text string"
    )
    # counts: a=3, b=3, c=1, z=1 -> ties break on token string
    model = {r.tok: r["rank"] for r in zipf_rank_model(ref).collect()}
    assert model == {"a": 1, "b": 2, "c": 3, "z": 4}
    capped = {r.tok for r in zipf_rank_model(ref, top_n=2).collect()}
    assert capped == {"a", "b"}


def test_zipf_quality_sums_and_oov(spark):
    """sum_rank charges OOV tokens max_rank+1; NULL text scores zeros;
    casing/whitespace fold into the same tokens as the model fit."""
    from kgforge.functions.textstats import zipf_quality, zipf_rank_model

    ref = spark.createDataFrame(
        [(1, "b b b a a c")], "doc_id bigint, text string"
    )
    model = zipf_rank_model(ref)  # a=1, b=2, c=3 -> oov rank 4
    docs = spark.createDataFrame(
        [(10, "  A b\tQQ "), (11, None)], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: (r.n_tok, r.n_oov, r.sum_rank)
        for r in zipf_quality(docs, model).collect()
    }
    assert out[10] == (3, 1, 1 + 2 + 4)
    assert out[11] == (0, 0, 0)


def test_funnel_zipf_perplexity_gate(spark):
    """The LM-quality stage drops rare-token soup (mean rank > num/den)
    with reason 'perplexity', after the quality gate and before dedup;
    fluent head-heavy docs pass."""
    from kgforge.functions.curate import curate_documents
    from kgforge.functions.textstats import zipf_rank_model

    common = "the of and to in it is was for on with that"
    ref = spark.createDataFrame(
        [(1, common * 3)], "doc_id bigint, text string"
    )
    model = zipf_rank_model(ref)  # vocab = the 12 common words
    docs = spark.createDataFrame(
        [
            (10, f"{common} {common}"),           # all in-vocab: low rank
            (11, "zyx wvu tsr qpo nml kji hgf"),  # all OOV: max rank
        ],
        "doc_id bigint, text string",
    )
    kept, audit = curate_documents(
        docs, lang_min_hits=0, min_tokens=1,
        zipf_model=model, max_mean_rank=(12, 1), near_dup=False,
    )
    assert {r.doc_id for r in kept.collect()} == {10}
    assert {(r.id, r.reason) for r in audit.collect()} == {
        (11, "perplexity")
    }


def test_window_chunks_overlap_and_edges(spark):
    """Windows advance by size-overlap and share exactly `overlap`
    tokens; short docs give one partial chunk; NULL text gives none;
    reassembling non-overlapped spans reproduces the document."""
    import pytest as _pytest

    from kgforge.sources.chunk import window_chunks

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, None)], "doc_id bigint, text string"
    )
    out = window_chunks(df, size=5, overlap=2)
    rows = {(r.id, r.chunk_idx): r for r in out.collect()}
    # n=10, size=5, step=3 -> ceil((10-2)/3)=3 chunks
    assert {(i, j) for i, j in rows} == {(1, 0), (1, 1), (1, 2), (2, 0)}
    assert rows[(1, 0)].chunk == "t0 t1 t2 t3 t4"
    assert rows[(1, 1)].chunk == "t3 t4 t5 t6 t7"
    assert rows[(1, 2)].chunk == "t6 t7 t8 t9"  # clipped tail
    assert rows[(1, 2)].n_chunk_tokens == 4
    assert rows[(2, 0)].chunk == "a b"  # short doc: one partial chunk
    # overlap property: last `overlap` tokens of chunk i == first of i+1
    a, b = rows[(1, 0)].chunk.split(), rows[(1, 1)].chunk.split()
    assert a[-2:] == b[:2]
    with _pytest.raises(ValueError):
        window_chunks(df, size=4, overlap=4)


def test_rollup_cascade_levels_consistent(spark):
    """Each cascade level equals the direct aggregate from raw at that
    grain (count/sum/min/max compose; decimal sums are order-exact)."""
    from pyspark.sql import functions as F

    from kgforge.functions.rollup import rollup_cascade

    rows = [
        (i, f"2024-0{1 + i % 2}-{1 + i % 3:02d} 0{i % 9}:30:00",
         ["a", "b"][i % 2], float(i) + 0.25)
        for i in range(200)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_type", "value")
    cascade = rollup_cascade(ev)
    for lvl in ("hour", "day", "month"):
        direct = {
            (r[0], r[1]): (r[2], float(r[3]), r[4], r[5])
            for r in ev.groupBy(
                F.date_trunc(lvl, "ts").alias("b"), "event_type"
            ).agg(
                F.count("*").cast("long"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                F.min("value"), F.max("value"),
            ).collect()
        }
        got = {
            (r["bucket"], r["event_type"]):
            (r["n"], float(r["total"]), r["vmin"], r["vmax"])
            for r in cascade[lvl].collect()
        }
        assert got == direct, lvl


def test_kmv_sketch_merge_and_estimate(spark):
    """Sketch state is a pure data function; merge(sketch(A), sketch(B))
    == sketch(A∪B); small groups are exact; estimates land within ~15%
    at k=64 on 1000 distinct values."""
    from pyspark.sql import functions as F

    from kgforge.functions.sketch import (
        kmv_estimate, kmv_merge, kmv_sketch,
    )

    big = [(i, "big", f"v{i}") for i in range(1000)]
    small = [(10_000 + i, "small", f"s{i % 7}") for i in range(50)]
    df = spark.createDataFrame(
        big + small, "row_id long, grp string, val string"
    )
    k = 64
    sk = kmv_sketch(df, "grp", "val", k=k)
    est = {
        r.grp: (r.n_kept, r.est)
        for r in sk.withColumn("est", kmv_estimate(F.col("kmv"), k)).collect()
    }
    assert est["small"] == (7, 7)  # below k: exact
    n_kept, e = est["big"]
    assert n_kept == k and 850 <= e <= 1150  # ~15% band
    # merge algebra: sketch(A) ++ sketch(B) == sketch(A ∪ B)
    a = kmv_sketch(df.where(F.col("row_id") % 2 == 0), "grp", "val", k=k)
    b = kmv_sketch(df.where(F.col("row_id") % 2 == 1), "grp", "val", k=k)
    merged = {
        r.grp: r.m
        for r in a.alias("a").join(b.alias("b"), on="grp").select(
            "grp", kmv_merge(F.col("a.kmv"), F.col("b.kmv"), k).alias("m")
        ).collect()
    }
    whole = {r.grp: r.kmv for r in sk.collect()}
    assert merged["big"] == whole["big"]
    # determinism: re-computation bit-identical
    again = {r.grp: r.kmv for r in kmv_sketch(df, "grp", "val", k=k).collect()}
    assert again == whole


def test_rollup_cascade_rejects_non_nesting_levels(spark):
    """Review fix: week straddles month/year boundaries — composing it
    below a coarser level must raise, not silently miscount."""
    import pytest as _pytest

    from kgforge.functions.rollup import rollup_cascade

    ev = spark.createDataFrame(
        [(1, "2024-02-03 10:00:00", "a", 1.0)],
        "event_id long, ts_s string, event_type string, value double",
    ).selectExpr("event_id", "cast(ts_s as timestamp) as ts",
                 "event_type", "value")
    with _pytest.raises(ValueError, match="week"):
        rollup_cascade(ev, levels=("week", "month"))
    with _pytest.raises(ValueError, match="fine -> coarse"):
        rollup_cascade(ev, levels=("month", "hour"))
    # week as the LAST level is fine
    assert "week" in rollup_cascade(ev, levels=("day", "week"))


def test_curate_span_duplication_gate(spark):
    """max_span_dup_pct (r5): docs mostly covered by corpus-duplicated
    spans drop with reason 'duplicated_spans'; lightly-touched docs
    survive."""
    from kgforge.functions.curate import curate_documents

    shared = " ".join(f"tok{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            # fully covered by the shared 12 tokens (+1 unique): ~92%
            (0, f"{shared} uniqueone"),
            (1, f"{shared} uniquetwo"),
            # shared span is a small fraction of a long unique doc
            (2, shared + " " + " ".join(f"own{i}" for i in range(60))),
            (3, " ".join(f"solo{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    kept, audit = curate_documents(
        docs, lang_min_hits=0, min_tokens=1,
        max_span_dup_pct=50, span_ngram=5, near_dup=False,
    )
    reasons = {(r.id, r.reason) for r in audit.collect()}
    assert (0, "duplicated_spans") in reasons
    assert (1, "duplicated_spans") in reasons
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids == {2, 3}


def test_hll_registers_exact_replay_and_estimate(spark):
    """Every register is replayed in pure Python (hashlib) — the same
    md5-string derivation the DuckDB oracle runs; the estimator lands
    within the HLL error band; merging register tables by per-bucket
    MAX equals sketching the union."""
    import hashlib

    from pyspark.sql import functions as F

    from kgforge.functions.sketch import hll_estimate, hll_registers

    vals = [f"v{i}" for i in range(1000)] + [f"s{i % 7}" for i in range(50)]
    grps = ["big"] * 1000 + ["small"] * 50
    df = spark.createDataFrame(
        list(zip(range(len(vals)), grps, vals)),
        "row_id long, grp string, val string",
    )
    reg = hll_registers(df, "grp", "val", p=8)
    got = {(r.grp, r.bucket): r.max_rho for r in reg.collect()}

    expected: dict[tuple[str, int], int] = {}
    for g, v in zip(grps, vals):
        h = hashlib.md5(v.encode()).hexdigest()
        bucket = int(h[:2], 16)
        tail = int(h[2:14], 16)
        rho = 49 if tail == 0 else 48 - tail.bit_length() + 1
        key = (g, bucket)
        expected[key] = max(expected.get(key, 0), rho)
    assert got == expected

    est = {r.grp: r.est for r in hll_estimate(reg, "grp", p=8).collect()}
    assert 800 <= est["big"] <= 1200  # 3-sigma at m=256 is ~20%
    assert 6 <= est["small"] <= 8  # linear-counting regime

    # merge algebra: union of register tables, groupBy-max == whole
    a = hll_registers(df.where(F.col("row_id") % 2 == 0), "grp", "val", p=8)
    b = hll_registers(df.where(F.col("row_id") % 2 == 1), "grp", "val", p=8)
    merged = (
        a.unionByName(b)
        .groupBy("grp", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    assert {(r.grp, r.bucket): r.max_rho for r in merged.collect()} == expected

    import pytest as _pt

    with _pt.raises(ValueError):
        hll_registers(df, "grp", "val", p=7)


def test_gapfill_locf_hand_series(spark):
    """Hand series: hours 0,1,3,6 present -> 7-row grid, gaps carry the
    last decimal total; oversized span raises instead of truncating."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from kgforge.functions.rollup import gapfill_locf

    h = 3_600_000_000
    rows = [
        ("a", 0 * h + 5, 1.5), ("a", 0 * h + 9, 2.0),
        ("a", 1 * h + 1, 4.0),
        ("a", 3 * h + 2, 8.0),
        ("a", 6 * h + 3, 1.0),
        ("b", 2 * h + 7, 9.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, us long, value double") \
        .select("event_type", F.timestamp_micros(F.col("us")).alias("ts"), "value")
    out = gapfill_locf(df, step_us=h)
    got = {
        (r.event_type, r.bucket_us // h): (r.n, float(r.total_locf), r.is_gap)
        for r in out.collect()
    }
    assert got == {
        ("a", 0): (2, 3.5, False),
        ("a", 1): (1, 4.0, False),
        ("a", 2): (0, 4.0, True),
        ("a", 3): (1, 8.0, False),
        ("a", 4): (0, 8.0, True),
        ("a", 5): (0, 8.0, True),
        ("a", 6): (1, 1.0, False),
        ("b", 2): (1, 9.0, False),
    }
    # guard: span wider than max_buckets raises at run time
    wide = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 100 * h, 1.0)],
        "event_type string, us long, value double",
    ).select("event_type", F.timestamp_micros(F.col("us")).alias("ts"), "value")
    with pytest.raises(Exception, match="exceeds"):
        gapfill_locf(wide, step_us=h, max_buckets=10).collect()
    with pytest.raises(ValueError):
        gapfill_locf(df, step_us=0)


def test_cm_sketch_overestimates_and_merges(spark):
    """CM point estimates are >= true counts (and exact for values whose
    4 cells are collision-free); merging two sketches by cell addition
    equals sketching the union; hashlib replays every cell address."""
    import hashlib

    from pyspark.sql import functions as F

    from kgforge.functions.sketch import cm_query, cm_sketch

    vals = [f"v{i % 50}" for i in range(500)] + ["hot"] * 200
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "row_id long, grp string, val string",
    )
    width, depth = 32, 4
    sk = cm_sketch(df, "grp", "val", width=width, depth=depth)

    # exact cell replay
    expected: dict[tuple[int, int], int] = {}
    for v in vals:
        for r in range(depth):
            h = hashlib.md5(f"cm{r}|{v}".encode()).hexdigest()
            b = int(h[:12], 16) % width
            expected[(r, b)] = expected.get((r, b), 0) + 1
    got = {(r.row, r.bucket): r.cnt for r in sk.collect()}
    assert got == expected

    items = df.select("grp", "val").dropDuplicates()
    est = {
        r.value: r.est
        for r in cm_query(sk, items, "grp", "val", width=width, depth=depth).collect()
    }
    from collections import Counter

    true = Counter(vals)
    assert all(est[v] >= c for v, c in true.items())
    assert est["hot"] >= 200  # heavy hitter dominates its cells

    # merge = union
    a = cm_sketch(df.where(F.col("row_id") % 2 == 0), "grp", "val", width=width, depth=depth)
    b = cm_sketch(df.where(F.col("row_id") % 2 == 1), "grp", "val", width=width, depth=depth)
    merged = (
        a.unionByName(b)
        .groupBy("grp", "row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert {(r.row, r.bucket): r.cnt for r in merged.collect()} == expected

    import pytest as _pt

    with _pt.raises(ValueError):
        cm_sketch(df, "grp", "val", width=1)


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted value probes true; fp rate stays under the budget
    on a disjoint probe set; merged filters == filter of the union;
    hashlib replays the bit table."""
    import hashlib

    from pyspark.sql import functions as F

    from kgforge.functions.sketch import bloom_build, bloom_probe

    members = [f"m{i}" for i in range(200)]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(members)],
        "row_id long, grp string, val string",
    )
    m_bits, k = 4096, 4
    bits = bloom_build(df, "grp", "val", m_bits=m_bits, k=k)
    expected = set()
    for v in members:
        for s in range(k):
            h = hashlib.md5(f"bf{s}|{v}".encode()).hexdigest()
            expected.add(int(h[:12], 16) % m_bits)
    assert {r.bit for r in bits.collect()} == expected

    probes = members + [f"x{i}" for i in range(500)]
    items = spark.createDataFrame(
        [("g", v) for v in probes], "grp string, val string"
    )
    got = {
        r.value: r.maybe
        for r in bloom_probe(bits, items, "grp", "val", m_bits=m_bits, k=k).collect()
    }
    assert all(got[v] for v in members)  # no false negatives
    fp = sum(got[f"x{i}"] for i in range(500)) / 500
    # n=200, m=4096, k=4 -> theoretical fp ~0.24%; allow generous slack
    assert fp < 0.05, fp

    # merge = union (distinct OR)
    a = bloom_build(df.where(F.col("row_id") % 2 == 0), "grp", "val", m_bits=m_bits, k=k)
    b = bloom_build(df.where(F.col("row_id") % 2 == 1), "grp", "val", m_bits=m_bits, k=k)
    merged = a.unionByName(b).dropDuplicates(["grp", "bit"])
    assert {r.bit for r in merged.collect()} == expected

    import pytest as _pt

    with _pt.raises(ValueError):
        bloom_build(df, "grp", "val", m_bits=1)


def test_session4_event_ops_all_jvm(spark):
    """retention, gapfill, co-occurrence, NB training, and the sketch
    family stay entirely JVM-side — no Python evaluation nodes."""
    from pyspark.sql import functions as F  # noqa: F401

    from kgforge.functions.classify import nb_train
    from kgforge.functions.funnel import retention_cohorts
    from kgforge.functions.rollup import gapfill_locf
    from kgforge.functions.sketch import bloom_build, cm_sketch, hll_registers
    from kgforge.functions.textstats import cooccurrence_counts

    import datetime as _dt

    ev = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1, 0, 0, 5), "view", 1.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    docs = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    frames = [
        retention_cohorts(ev),
        gapfill_locf(ev),
        cooccurrence_counts(docs, window=2, min_count=1),
        nb_train(docs, "lang").token_df,
        hll_registers(docs, "lang", "text"),
        cm_sketch(docs, "lang", "text", width=8, depth=2),
        bloom_build(docs, "lang", "text", m_bits=64, k=2),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan[:400]
        assert "ArrowEvalPython" not in plan, plan[:400]
        assert "CartesianProduct" not in plan, plan[:400]


def test_kmv_setops_estimates_track_exact_overlap(spark):
    """Intersection/Jaccard estimates from sketch state track the exact
    set overlap on controlled vocabularies (shared block + disjoint
    tails); disjoint sets give 0; identical sets give jaccard 1."""
    from pyspark.sql import functions as F

    from kgforge.functions.sketch import (
        kmv_intersect_count, kmv_jaccard, kmv_merge, kmv_sketch,
    )

    shared = [f"s{i}" for i in range(400)]
    a_only = [f"a{i}" for i in range(600)]
    b_only = [f"b{i}" for i in range(600)]
    rows = (
        [("A", w) for w in shared + a_only]
        + [("B", w) for w in shared + b_only]
        + [("C", w) for w in a_only]  # disjoint from B
    )
    df = spark.createDataFrame(rows, "grp string, w string")
    k = 128
    sk = kmv_sketch(df, "grp", "w", k=k)
    s = {r.grp: r.kmv for r in sk.collect()}
    two = spark.createDataFrame([(s["A"], s["B"]), (s["A"], s["A"]), (s["B"], s["C"])],
                                "x array<string>, y array<string>")
    out = two.select(
        kmv_intersect_count(F.col("x"), F.col("y"), k).alias("inter"),
        kmv_jaccard(F.col("x"), F.col("y"), k).alias("j"),
        F.size(kmv_merge(F.col("x"), F.col("y"), k)).alias("nu"),
    ).collect()
    ab, aa, bc = out
    # true jaccard(A,B) = 400/1600 = 0.25; k=128 sample -> generous band
    assert 0.12 <= ab.j <= 0.40, ab
    assert ab.nu == k
    assert aa.j == 1.0 and aa.inter == k
    assert bc.inter == 0 and bc.j == 0.0


def test_ohlc_bars_hand_series(spark):
    from datetime import datetime

    from kgforge.functions.rollup import ohlc_bars

    rows = [
        # one day, one key: open=5.0 (earliest), close=2.0 (latest),
        # high=9.0, low=1.0, n=4, volume=17.0
        (1, datetime(2024, 3, 1, 8, 0, 0), "buy", 5.0),
        (2, datetime(2024, 3, 1, 9, 0, 0), "buy", 9.0),
        (3, datetime(2024, 3, 1, 10, 0, 0), "buy", 1.0),
        (4, datetime(2024, 3, 1, 11, 0, 0), "buy", 2.0),
        # second day: single event, open == close
        (5, datetime(2024, 3, 2, 8, 0, 0), "buy", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {r.bucket.day: r for r in ohlc_bars(ev, bucket="day").collect()}
    d1 = out[1]
    assert (d1.open, d1.high, d1.low, d1.close, d1.n) == (5.0, 9.0, 1.0, 2.0, 4)
    assert float(d1.volume) == 17.0
    d2 = out[2]
    assert (d2.open, d2.close, d2.n) == (7.0, 7.0, 1)


def test_ohlc_bars_timestamp_tie_breaks_by_id(spark):
    from datetime import datetime

    from kgforge.functions.rollup import ohlc_bars

    t = datetime(2024, 3, 1, 8, 0, 0)
    ev = spark.createDataFrame(
        [(2, t, "k", 20.0), (1, t, "k", 10.0), (3, t, "k", 30.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    r = ohlc_bars(ev, bucket="day").collect()[0]
    # all three share the timestamp: open = lowest id, close = highest id
    assert r.open == 10.0 and r.close == 30.0


def test_anomaly_flags_python_replay(spark):
    import statistics

    from kgforge.functions.rollup import anomaly_flags

    # key A: ten 10.00s + one 100.00 -> z(100) = 2.39 > 2, z(10) small
    vals_a = [10.0] * 10 + [100.0]
    rows = [(i, "A", v) for i, v in enumerate(vals_a)]
    # key B: constant -> variance 0, nothing flagged
    rows += [(100 + i, "B", 5.0) for i in range(5)]
    # key C: single row -> n < min_n, never flagged
    rows += [(200, "C", 999.0)]
    ev = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    got = {r.id for r in anomaly_flags(ev, threshold=2).collect()}

    mean, sd = statistics.mean(vals_a), statistics.stdev(vals_a)
    expect = {i for i, v in enumerate(vals_a) if abs(v - mean) > 2 * sd}
    assert expect == {10}, "test fixture must flag exactly the outlier"
    assert got == expect

    import pytest

    with pytest.raises(ValueError):
        anomaly_flags(ev, threshold=0)
    with pytest.raises(ValueError):
        anomaly_flags(ev, min_n=1)


def test_kmv_difference_closed_form(spark):
    from pyspark.sql import functions as F

    from kgforge.functions.sketch import (
        kmv_difference_count,
        kmv_merge,
        kmv_sketch,
    )

    shared = [f"s{i}" for i in range(400)]
    a_only = [f"a{i}" for i in range(1200)]
    b_only = [f"b{i}" for i in range(1200)]
    rows = (
        [("A", w) for w in shared + a_only]
        + [("B", w) for w in shared + b_only]
        + [("C", w) for w in a_only]
    )
    df = spark.createDataFrame(rows, "grp string, w string")
    k = 128
    s = {r.grp: r.kmv for r in kmv_sketch(df, "grp", "w", k=k).collect()}
    two = spark.createDataFrame(
        [(s["A"], s["A"]), (s["A"], s["C"]), (s["B"], s["C"])],
        "x array<string>, y array<string>",
    )
    out = two.select(
        kmv_difference_count(F.col("x"), F.col("y"), k).alias("anb"),
        kmv_difference_count(F.col("y"), F.col("x"), k).alias("bna"),
        F.size(kmv_merge(F.col("x"), F.col("y"), k)).alias("nu"),
    ).collect()
    aa, ac, bc = out
    assert aa.anb == 0 and aa.bna == 0          # identical sketches
    # C subset-of A: nothing in C misses A; A\C fraction ~ 400/1600
    assert ac.bna == 0 and 0.10 * ac.nu <= ac.anb <= 0.45 * ac.nu
    # B and C disjoint: every cut point is in exactly one side
    assert bc.anb + bc.bna == bc.nu


def test_moments_sketch_merge_and_stats(spark):
    import statistics

    from pyspark.sql import functions as F

    from kgforge.functions.sketch import (
        moments_merge,
        moments_sketch,
        moments_stats,
    )

    vals = [1.25, 2.5, 2.5, 4.0, 10.0, 3.75, 0.25, 6.5]
    rows = [("k", "h1" if i < 4 else "h2", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, part string, value double")

    fine = moments_sketch(df, ["key", "part"], "value")
    merged = moments_merge(fine, ["key"]).collect()[0]
    direct = moments_sketch(df, ["key"], "value").collect()[0]
    # merging partials == sketching the raw rows (the mergeability law)
    assert (merged.n, merged.m1, merged.m2, merged.m3, merged.m4) == (
        direct.n, direct.m1, direct.m2, direct.m3, direct.m4,
    )
    # exact integer state: m1 at cent scale
    assert int(merged.m1) == round(sum(vals) * 100)
    assert int(merged.m2) == sum(round(v * 100) ** 2 for v in vals)
    assert int(merged.m4) == sum(round(v * 100) ** 4 for v in vals)

    st = moments_stats(moments_merge(fine, ["key"])).collect()[0]
    assert abs(st.mean - statistics.mean(vals)) < 1e-9
    assert abs(st.variance - statistics.pvariance(vals)) < 1e-9
    # python replay of the central-moment ratios
    mu = statistics.mean(vals)
    mu3 = sum((v - mu) ** 3 for v in vals) / len(vals)
    mu4 = sum((v - mu) ** 4 for v in vals) / len(vals)
    pv = statistics.pvariance(vals)
    assert abs(st.skewness - mu3 / pv ** 1.5) < 1e-9
    assert abs(st.kurtosis - mu4 / pv ** 2) < 1e-9
