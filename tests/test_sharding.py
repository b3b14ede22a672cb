"""Deterministic corpus sharding (functions/sharding.py): hash-split
stability, prefix-sum shard assignment independent of partition layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.functions.sharding import hash_split, split_bounds, token_shards


def test_hash_split_deterministic_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(17)).collect()
    }
    assert a == b
    # expected fractions within a loose band (md5 is uniform)
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.95 * n <= train <= n  # 98% nominal
    assert set(a.values()) <= {"train", "val", "test"}
    # salt re-roll changes assignments
    c = {r.doc_id: r.split for r in hash_split(df, salt="other").collect()}
    assert c != a


def test_split_bounds_are_cumulative_hex():
    bounds = split_bounds([("a", 1), ("b", 1)])
    assert bounds == [("80000000", "a"), ("100000000", "b")]


def test_token_shards_matches_serial_scan_any_layout(spark):
    """Shard assignment == the serial greedy offset scan, whatever the
    partition count; docs bigger than the budget own their offset."""
    rows = [(i, (i % 7 + 1) * 10) for i in range(200)]
    rows[50] = (50, 500)  # bigger than the budget below
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    expect = {}
    run = 0
    for i, w in sorted(rows):
        expect[i] = run // 100
        run += w
    for parts in (1, 3, 16):
        got = {
            r.doc_id: r.shard
            for r in token_shards(
                df, budget=100, num_partitions=parts
            ).collect()
        }
        assert got == expect, f"layout {parts} diverged"


def test_token_shards_null_weights_count_zero(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, None), (3, 60)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: r.shard
        for r in token_shards(df, budget=100, num_partitions=2).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0}


# ---- embedding prep (functions/embeddings.py) -------------------------


def test_l2_normalize_and_quantize_roundtrip(spark):
    import math

    from kgforge.functions.embeddings import (
        dequantize_int8, l2_normalize, quantize_int8,
    )

    rows = [
        (1, [3.0, 4.0]),
        (2, [0.0, 0.0]),          # zero vector: stays zero, scale 0
        (3, [-1.5, 0.5, 2.0]),
        (4, [1e-6, -1e-6]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    unit = {r.vec_id: r.vec_unit for r in l2_normalize(df).collect()}
    assert unit[1] == [0.6, 0.8]
    assert unit[2] == [0.0, 0.0]
    for vid, v in unit.items():
        n = math.sqrt(sum(x * x for x in v))
        assert vid == 2 or abs(n - 1.0) < 1e-12
    # cosine invariance: normalize twice == once
    twice = {
        r.vec_id: r.v2
        for r in l2_normalize(
            l2_normalize(df).withColumnRenamed("vec_unit", "u"),
            vec_col="u", out_col="v2",
        ).collect()
    }
    for vid in unit:
        assert all(
            abs(a - b) < 1e-12 for a, b in zip(unit[vid], twice[vid])
        )

    q = {
        r.vec_id: (r.q_scale, r.q_vec)
        for r in quantize_int8(df).collect()
    }
    assert q[1] == (4.0, [95, 127])       # 3/4*127=95.25 -> 95
    assert q[2] == (0.0, [0, 0])
    assert q[3][1] == [-95, 32, 127]      # -1.5/2*127=-95.25 -> floor+.5
    # dequantization error bound: |x - q*scale/127| <= scale/254
    deq = {
        r.vec_id: r.vec_approx
        for r in dequantize_int8(quantize_int8(df)).collect()
    }
    for vid, orig in rows:
        scale = q[vid][0]
        for a, b in zip(orig, deq[vid]):
            assert abs(a - b) <= scale / 254 + 1e-12


def test_mix_corpus_budget_semantics_and_layout_independence(spark):
    """Serial-scan twin: per source, hash-order docs and keep while the
    prior running weight < budget (boundary doc included). The Spark
    grouped two-phase prefix-sum must match at every partition count,
    and sources without a budget must drop."""
    import hashlib

    from kgforge.functions.sharding import mix_corpus

    rows = [
        (i, f"s{i % 3}", 10 + (i * 7) % 50) for i in range(60)
    ]  # s0/s1/s2, varied weights
    budgets = {"s0": 120, "s1": 35}  # s2 drops entirely
    salt = "kgforge-mix"

    def serial():
        keep = set()
        by_src: dict[str, list] = {}
        for i, s, w in rows:
            hx = hashlib.md5(f"{salt}{i}".encode()).hexdigest()
            by_src.setdefault(s, []).append((hx, i, w))
        for s, docs in by_src.items():
            if s not in budgets:
                continue
            run = 0
            for hx, i, w in sorted(docs):
                if run < budgets[s]:
                    keep.add(i)
                run += w
        return keep

    expected = serial()
    assert expected  # non-trivial
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    for n_parts in (1, 3, 16):
        got = {
            r["doc_id"]
            for r in mix_corpus(
                df.repartition(5), budgets, num_partitions=n_parts
            ).collect()
        }
        assert got == expected, n_parts
    # overshoot bound: per source, kept weight - budget < max doc weight
    out = mix_corpus(df, budgets).groupBy("source").agg(
        F.sum("n_tokens").alias("w")
    ).collect()
    for r in out:
        assert r["w"] - budgets[r["source"]] < 60


def test_mix_corpus_rejects_bad_budgets(spark):
    import pytest as _pytest

    from kgforge.functions.sharding import mix_corpus

    df = spark.createDataFrame(
        [(1, "a", 5)], "doc_id long, source string, n_tokens long"
    )
    with _pytest.raises(ValueError):
        mix_corpus(df, {})
    with _pytest.raises(ValueError):
        mix_corpus(df, {"a": -1})


def test_stratified_sample_nested_deterministic(spark):
    """Per-stratum keep decisions are pure key functions: partition-layout
    independent, salt-rerollable, and NESTED (rate 1/4 sample is a subset
    of the 1/2 sample — the ablation-ladder property)."""
    from kgforge.functions.sharding import sample_bound, stratified_sample

    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    half = {
        r.doc_id
        for r in stratified_sample(df, {"en": (1, 2)}).collect()
    }
    quarter = {
        r.doc_id
        for r in stratified_sample(df, {"en": (1, 4)}).collect()
    }
    assert quarter <= half  # nesting
    # non-en strata ride the default rate (1,1): all kept
    non_en = {i for i, lang in rows if lang != "en"}
    assert non_en <= half
    en = {i for i, lang in rows if lang == "en"}
    kept_en = half & en
    assert 0.4 * len(en) <= len(kept_en) <= 0.6 * len(en)
    # layout independence
    relaid = {
        r.doc_id
        for r in stratified_sample(df.repartition(17), {"en": (1, 2)}).collect()
    }
    assert relaid == half
    # zero rate drops the stratum; >=1 keeps it whole
    out = stratified_sample(df, {"zh": (0, 1), "de": (3, 2)})
    langs = {r.lang for r in out.collect()}
    assert "zh" not in langs and "de" in langs
    assert out.where(F.col("lang") == "de").count() == len(
        {i for i, l in rows if l == "de"}
    )
    # salt re-roll changes the kept set
    other = {
        r.doc_id
        for r in stratified_sample(df, {"en": (1, 2)}, salt="x").collect()
    }
    assert other != half
    # bound literal sanity
    assert sample_bound(1, 2) == "80000000"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_bound(1, 0)


def test_pack_sequences_matches_serial_scan_any_layout(spark):
    """Offsets/blocks == the serial concat-and-chunk scan at every
    partition count; straddling docs report the full block span; NULL
    weight counts 0 and touches one block."""
    from kgforge.functions.sharding import pack_sequences

    rows = [(i, (i % 5 + 1) * 30) for i in range(100)]
    rows[20] = (20, 500)   # straddles several 128-blocks
    rows[21] = (21, None)  # empty doc
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    expect = {}
    run = 0
    for i, w in sorted(rows):
        w0 = w or 0
        first = run // 128
        last = (run + w0 - 1) // 128 if w0 > 0 else first
        expect[i] = (run, first, last, last - first + 1)
        run += w0
    for parts in (1, 3, 16):
        got = {
            r.doc_id: (r.offset, r.first_block, r.last_block, r.n_blocks)
            for r in pack_sequences(
                df, block=128, num_partitions=parts
            ).collect()
        }
        assert got == expect, f"layout {parts} diverged"
    assert expect[20][3] > 1  # the straddler really straddles
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(df, block=0)


# ---- as-of join (operators/asof.py) ----------------------------------


def test_asof_join_semantics(spark):
    """Each left row gets the latest right row at-or-before its ts per
    key; strict excludes equal-ts; no prior right -> NULLs; right rows
    never fabricate left rows."""
    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", 100, "p100"),
            (2, "u1", 205, "p205"),
            (3, "u1", 50, "pearly"),
            (4, "u2", 300, "lonely"),   # u2 has no right rows
        ],
        "event_id long, user string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 100, "r100"),
            ("u1", 200, "r200"),
            ("u1", 400, "rlate"),
            ("u3", 10, "unused"),
        ],
        "user string, ts long, rtag string",
    )
    out = {
        r.event_id: (r.ts_r, r.rtag_r)
        for r in asof_join(left, right, on="user").collect()
    }
    assert out == {
        1: (100, "r100"),   # inclusive: equal ts matches
        2: (200, "r200"),
        3: (None, None),    # before any right row
        4: (None, None),    # key with no right side
    }
    strict = {
        r.event_id: (r.ts_r, r.rtag_r)
        for r in asof_join(left, right, on="user", strict=True).collect()
    }
    assert strict[1] == (None, None)  # equal ts excluded
    assert strict[2] == (200, "r200")
    # layout independence: one shuffle on the key, any input partitioning
    relaid = {
        r.event_id: (r.ts_r, r.rtag_r)
        for r in asof_join(
            left.repartition(7), right.repartition(3), on="user"
        ).collect()
    }
    assert relaid == out


def test_range_join_bucketized(spark):
    """Bucketized point-in-interval join == the exact predicate join:
    inclusive bounds, keyed, intervals spanning many buckets, empty and
    inverted intervals."""
    from kgforge.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "k1", 5), (2, "k1", 100), (3, "k1", 250), (4, "k2", 5)],
        "pid long, k string, v long",
    )
    intervals = spark.createDataFrame(
        [
            ("k1", 0, 10, "a"),       # catches 5
            ("k1", 5, 5, "pt"),       # degenerate, catches exactly 5
            ("k1", 90, 260, "wide"),  # spans many 16-buckets: 100, 250
            ("k1", 300, 200, "inv"),  # inverted: nothing
            ("k2", 0, 10, "b"),       # other key: catches k2's 5 only
        ],
        "k string, lo long, hi long, tag string",
    )
    out = {
        (r.pid, r.tag)
        for r in range_join(
            points, intervals, "v", "lo", "hi", on="k", bucket=16
        ).collect()
    }
    assert out == {
        (1, "a"), (1, "pt"), (2, "wide"), (3, "wide"), (4, "b"),
    }


def test_asof_join_with_map_payload(spark):
    """Review fix: right-side map columns (props) must not break the
    window ordering (structs with maps cannot be sort keys)."""
    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 10)], "pid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, {"a": "1"}), ("k", 7, {"b": "2"})],
        "k string, ts long, props map<string,string>",
    )
    out = asof_join(left, right, on="k").collect()
    assert out[0].ts_r == 7 and dict(out[0].props_r) == {"b": "2"}


def test_temporal_join_plan_shapes(spark):
    """Plan pins for the scale properties: asof_join = ONE Exchange +
    Window, ZERO joins; range_join = equi-join only (never
    BroadcastNestedLoopJoin/CartesianProduct)."""
    from pyspark.sql import functions as F

    from kgforge.operators.asof import asof_join, range_join

    left = spark.createDataFrame(
        [(1, "k", 10)], "pid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, "x")], "k string, ts long, tag string"
    )
    asof_plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in asof_plan  # union-sort shape: no join operator
    assert asof_plan.count("Exchange") == 1 or (
        # AQE may wrap; count only shuffle exchanges
        asof_plan.count("Exchange hashpartitioning") <= 1
    )
    assert "Window" in asof_plan

    iv = right.select("k", F.col("ts").alias("lo"),
                      (F.col("ts") + 100).alias("hi"), "tag")
    rng_plan = range_join(
        left, iv, "ts", "lo", "hi", on="k", bucket=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in rng_plan
    assert "CartesianProduct" not in rng_plan
    assert "Join" in rng_plan and "Generate" in rng_plan


def test_asof_join_time_split_matches_unsplit(spark):
    """time_split (verdict r04 #9) must be RESULT-IDENTICAL to the
    unsplit join while re-keying the carry-forward window on
    (key, range): one synthetic hot key whose rows span many ranges,
    matches crossing range boundaries (left ranges with no right rows
    draw from the carried seed), ties at equal ts, and a strict leg."""
    from kgforge.operators.asof import asof_join

    # hot key "hot": rights only in early ranges, lefts spread across
    # ranges 0..9 (width=100); key "cold" exercises the per-key seed
    # isolation; equal-ts duplicate rights exercise the tie-break
    left_rows = [(i, "hot", 37 + 100 * i) for i in range(10)]
    left_rows += [(100, "cold", 505), (101, "cold", 5)]
    right_rows = [("hot", 20, "r20"), ("hot", 120, "r120"),
                  ("hot", 137, "tie_a"), ("hot", 137, "tie_b"),
                  ("cold", 400, "c400")]
    left = spark.createDataFrame(left_rows, "eid long, k string, ts long")
    right = spark.createDataFrame(right_rows, "k string, ts long, tag string")

    def snap(**kw):
        return {
            r.eid: (r.ts_r, r.tag_r)
            for r in asof_join(left, right, on="k", **kw).collect()
        }

    base = snap()
    assert snap(time_split=100) == base
    assert snap(time_split=1) == base          # every row its own range
    assert snap(time_split=10_000) == base     # one range = unsplit
    assert snap(time_split=100, strict=True) == snap(strict=True)
    # sanity on the fixture itself: eid 5 (ts 537) matches the carried
    # tie-winner from range 1, four ranges earlier
    assert base[5][0] == 137
    assert base[100] == (400, "c400") and base[101] == (None, None)

    # plan pin: the carry-forward window partitions by (key, range) —
    # the hot key's rows hash to #ranges tasks, not one
    plan = (
        asof_join(left, right, on="k", time_split=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(k#" in plan and "__r#" in plan


def test_asof_join_guards(spark):
    """Reserved internal names collide loudly (ADVICE r04); bad
    time_split values name the problem."""
    import pytest

    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 10)], "pid long, k string, ts long")
    right = spark.createDataFrame([("k", 5, "x")], "k string, ts long, tag string")
    with pytest.raises(ValueError, match="__p"):
        asof_join(left.withColumn("__p", left.ts), right, on="k")
    with pytest.raises(ValueError, match="__side"):
        asof_join(left, right.withColumn("__side", right.ts), on="k")
    with pytest.raises(ValueError, match="unknown time_split"):
        asof_join(left, right, on="k", time_split="fortnight")
    with pytest.raises(ValueError, match="timestamp"):
        # named widths are micros-based; numeric ts needs an int width
        asof_join(left, right, on="k", time_split="day")


def test_asof_join_time_split_timestamps(spark):
    """Named widths on real timestamps: 'day' splitting matches the
    unsplit result on a month of events."""
    import datetime as dt

    from kgforge.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, "u", t0 + dt.timedelta(hours=7 * i)) for i in range(40)],
        "eid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t0 + dt.timedelta(days=3 * j), f"snap{j}") for j in range(4)],
        "k string, ts timestamp, tag string",
    )

    def snap(**kw):
        return {
            r.eid: (r.ts_r, r.tag_r)
            for r in asof_join(left, right, on="k", **kw).collect()
        }

    base = snap()
    assert snap(time_split="day") == base
    assert snap(time_split="week") == base


def test_sample_exact_k_size_nesting_layout(spark):
    """sample_exact_k (r5): exact per-stratum sizes, k-nesting, and
    partition-layout independence."""
    from kgforge.functions.sharding import sample_exact_k

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s6 = sample_exact_k(df, 6, strata_col="lang", key_col="doc_id")
    sizes = {
        r.lang: r.n
        for r in s6.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"en": 6, "de": 6}
    s3 = sample_exact_k(df, 3, strata_col="lang", key_col="doc_id")
    ids3 = {(r.lang, r.doc_id) for r in s3.collect()}
    ids6 = {(r.lang, r.doc_id) for r in s6.collect()}
    assert ids3 < ids6  # nested: the k=3 sample is inside the k=6 one
    relaid = sample_exact_k(
        df.repartition(13), 6, strata_col="lang", key_col="doc_id"
    )
    assert {(r.lang, r.doc_id) for r in relaid.collect()} == ids6
    # k larger than a stratum keeps the whole stratum
    s99 = sample_exact_k(df, 99, strata_col="lang", key_col="doc_id")
    assert s99.count() == 60


def test_asof_forward_and_tolerance(spark):
    """direction='forward' picks the EARLIEST right row at-or-after
    (strict: after) the left ts; tolerance nulls matches farther than
    the bound in either direction (merge_asof parity)."""
    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", 100),
            (2, "u1", 205),
            (3, "u1", 50),
            (4, "u2", 300),   # u2 has no right rows
            (5, "u1", 500),   # after every right row
        ],
        "event_id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 100, "r100"), ("u1", 200, "r200"), ("u1", 400, "rlate"),
         ("u3", 10, "unused")],
        "user string, ts long, rtag string",
    )

    def snap(**kw):
        return {
            r.event_id: (r.ts_r, r.rtag_r)
            for r in asof_join(
                left, right, on="user", direction="forward", **kw
            ).collect()
        }

    fwd = snap()
    assert fwd == {
        1: (100, "r100"),   # inclusive: equal ts matches
        2: (400, "rlate"),
        3: (100, "r100"),
        4: (None, None),
        5: (None, None),    # nothing at-or-after
    }
    assert snap(strict=True)[1] == (200, "r200")  # equal ts excluded
    # tolerance bounds the forward gap (inclusive compare)
    tol = snap(tolerance=50)
    assert tol[1] == (100, "r100")
    assert tol[2] == (None, None)   # gap 195 > 50
    assert tol[3] == (100, "r100")  # gap exactly 50 kept
    # tolerance on the backward default too
    back = {
        r.event_id: (r.ts_r, r.rtag_r)
        for r in asof_join(
            left, right, on="user", tolerance=4
        ).collect()
    }
    assert back[2] == (None, None)  # backward gap 5 > 4
    assert back[1] == (100, "r100")
    # layout independence (one shuffle on the key)
    relaid = {
        r.event_id: (r.ts_r, r.rtag_r)
        for r in asof_join(
            left.repartition(7), right.repartition(3), on="user",
            direction="forward",
        ).collect()
    }
    assert relaid == fwd
    import pytest as _pt
    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, on="user", direction="nearest")
    with _pt.raises(ValueError, match="tolerance"):
        asof_join(left, right, on="user", tolerance=-1)


def test_asof_forward_time_split_matches_unsplit(spark):
    """forward + time_split is result-identical to the unsplit forward
    join: the negated-axis trick must compose with the (key, range)
    re-keying, including matches drawn from LATER ranges via the
    carried seed and equal-ts tie rows."""
    from kgforge.operators.asof import asof_join

    left_rows = [(i, "hot", 37 + 100 * i) for i in range(10)]
    left_rows += [(100, "cold", 505), (101, "cold", 5)]
    right_rows = [("hot", 950, "r950"), ("hot", 820, "r820"),
                  ("hot", 837, "tie_a"), ("hot", 837, "tie_b"),
                  ("cold", 400, "c400")]
    left = spark.createDataFrame(left_rows, "eid long, k string, ts long")
    right = spark.createDataFrame(
        right_rows, "k string, ts long, tag string"
    )

    def snap(**kw):
        return {
            r.eid: (r.ts_r, r.tag_r)
            for r in asof_join(
                left, right, on="k", direction="forward", **kw
            ).collect()
        }

    base = snap()
    assert snap(time_split=100) == base
    assert snap(time_split=1) == base
    assert snap(time_split=10_000) == base
    assert snap(time_split=100, strict=True) == snap(strict=True)
    # fixture sanity: eid 0 (ts 37) matches the carried tie-winner from
    # a much later range; cold key stays isolated
    assert base[0][0] == 820 or base[0][0] == 837 or base[0][0] == 950
    assert base[101] == (400, "c400") and base[100] == (None, None)


def test_asof_forward_timestamp_named_split(spark):
    """Named time_split widths work under forward on TIMESTAMP columns
    (resolved to micros before the axis negation)."""
    from kgforge.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 00:00:00"), (2, "k", "2024-01-03 12:00:00")],
        "eid long, k string, s string",
    ).select("eid", "k", F.col("s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-02 00:00:00", "a"), ("k", "2024-01-05 00:00:00", "b")],
        "k string, s string, tag string",
    ).select("k", F.col("s").cast("timestamp").alias("ts"), "tag")
    base = {
        r.eid: r.tag_r
        for r in asof_join(
            left, right, on="k", direction="forward"
        ).collect()
    }
    assert base == {1: "a", 2: "b"}
    split = {
        r.eid: r.tag_r
        for r in asof_join(
            left, right, on="k", direction="forward", time_split="day"
        ).collect()
    }
    assert split == base


def test_weighted_sample_exact_python_replay_and_nesting(spark):
    """Keep decision == the hashlib replay of h*den < w*num*16^8;
    monotone in weight and base rate (nested samples); weight 0/NULL
    drops; w*num >= den keeps always."""
    import hashlib

    from kgforge.functions.sharding import weighted_sample

    rows = [(i, (i * 7) % 11) for i in range(500)]  # weights 0..10
    rows += [(1000, None)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def replay(num, den):
        keep = set()
        for i, w in rows:
            if w is None:
                continue
            h = int(hashlib.md5(f"kgforge{i}".encode()).hexdigest()[:8], 16)
            if h * den < w * num * 16 ** 8:
                keep.add(i)
        return keep

    got = {r.doc_id for r in weighted_sample(df, "w", (1, 10)).collect()}
    assert got == replay(1, 10)
    # weight 0 rows never survive; NULL dropped
    assert not any((i * 7) % 11 == 0 for i in got if i < 1000)
    assert 1000 not in got
    # nested: lower base rate is a subset of higher
    lo = {r.doc_id for r in weighted_sample(df, "w", (1, 20)).collect()}
    assert lo <= got
    # w*num >= den keeps everything with a weight
    allkept = {
        r.doc_id
        for r in weighted_sample(
            df.filter(F.col("w") >= 1), "w", (11, 1)
        ).collect()
    }
    assert allkept == {i for i, w in rows if w is not None and w >= 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample(df, "w", (1, 0))


def test_weighted_sample_is_scan_side_filter(spark):
    """One Filter over the scan — no shuffle, no join, no Python."""
    from kgforge.functions.sharding import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("w")
    )
    plan = (
        weighted_sample(df, "w", (1, 4))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_matches_python_interleave(spark):
    """shiftright/bitwiseAND Morton key == pure-Python bit interleave,
    including negative inputs (pmod wrap) and the bits guard."""
    import pytest
    from pyspark.sql import functions as F

    from kgforge.sinks.zorder import zorder_key

    vals = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (-1, 7),
            (123456, 654321), (40000, 1)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = [
        r.z
        for r in df.select(
            zorder_key(F.col("x"), F.col("y"), bits=16).alias("z")
        ).collect()
    ]

    def morton(x, y, bits=16):
        x %= 1 << bits
        y %= 1 << bits
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(x, y) for x, y in vals]
    with pytest.raises(ValueError):
        zorder_key(F.col("x"), F.col("y"), bits=0)


def test_zordered_layout_prunes_both_dimensions(spark, workdir):
    """Files of a z-ordered write cover small (x, y) rectangles: a
    narrow band on EITHER dimension intersects only a fraction of the
    files' footer ranges, while an x-sorted layout cannot skip on y."""
    from pyspark.sql import functions as F

    from kgforge.sinks.bucketed import file_ranges, write_range_partitioned
    from kgforge.sinks.zorder import write_zordered

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
    )
    zpath = write_zordered(df, f"{workdir}/z", ("x", "y"), bits=7, n_files=16)
    lpath = write_range_partitioned(df, f"{workdir}/lin", col="x", n_partitions=16)

    def hit_fraction(path, col, lo, hi):
        rngs = file_ranges(path, col)
        assert rngs, path
        hits = sum(1 for _, mn, mx in rngs if not (mx < lo or mn > hi))
        return hits / len(rngs)

    # a 1/8-wide band on either dim touches only a few Morton rectangles
    assert hit_fraction(zpath, "x", 0, 15) <= 0.5
    assert hit_fraction(zpath, "y", 0, 15) <= 0.5
    # the x-sorted layout prunes x but cannot skip anything on y
    assert hit_fraction(lpath, "x", 0, 15) <= 0.25
    assert hit_fraction(lpath, "y", 0, 15) == 1.0


def test_equidepth_histogram_exact_and_layout_independent(spark):
    """Bucket sizes within one row; serial-scan twin agrees at 1/3/16
    partitions; empty input yields an empty frame; n_buckets guard."""
    import pytest
    from pyspark.sql import functions as F

    from kgforge.functions.sharding import equidepth_histogram

    vals = [(i, float((i * 37) % 101)) for i in range(333)]
    df = spark.createDataFrame(vals, "k long, v double")

    ordered = sorted(vals, key=lambda t: (t[1], t[0]))
    total = len(ordered)
    n = 8
    expected: dict[int, list[float]] = {}
    for rank, (_, v) in enumerate(ordered):
        expected.setdefault(rank * n // total, []).append(v)
    exp = {
        b: (len(vs), min(vs), max(vs)) for b, vs in expected.items()
    }

    for parts in (1, 3, 16):
        got = {
            r.bucket: (r.cnt, r.lo, r.hi)
            for r in equidepth_histogram(
                df.repartition(parts), "v", n_buckets=n, key_col="k"
            ).collect()
        }
        assert got == exp, parts
    sizes = [c for c, _, _ in exp.values()]
    assert max(sizes) - min(sizes) <= 1

    empty = equidepth_histogram(df.where(F.col("v") < 0), "v", n_buckets=4)
    assert empty.count() == 0
    with pytest.raises(ValueError):
        equidepth_histogram(df, "v", n_buckets=0)


def test_hash_features_hashlib_replay(spark):
    """Every sparse cell replays in pure Python; unsigned mode counts;
    dim guard raises; collisions sum signed values."""
    import hashlib

    import pytest

    from kgforge.functions.embeddings import hash_features

    docs = [(1, "apple banana apple"), (2, "banana"), (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 32

    def cell(w):
        idx = int(hashlib.md5(f"fh|{w}".encode()).hexdigest()[:12], 16) % dim
        sgn = 1 if hashlib.md5(f"fs|{w}".encode()).hexdigest()[0] >= "8" else -1
        return idx, sgn

    expected: dict[tuple[int, int], int] = {}
    for did, text in docs:
        if text is None:
            continue
        for w in text.lower().split():
            idx, sgn = cell(w)
            expected[(did, idx)] = expected.get((did, idx), 0) + sgn
    got = {
        (r.id, r.idx): r.val
        for r in hash_features(df, dim=dim).collect()
    }
    assert got == expected

    unsigned = {
        (r.id, r.idx): r.val
        for r in hash_features(df, dim=dim, signed=False).collect()
    }
    assert unsigned[(1, cell("apple")[0])] >= 2  # counts, not signs
    with pytest.raises(ValueError):
        hash_features(df, dim=1)


def test_random_projection_numpy_parity_and_distance_preservation(spark):
    """Float projection equals numpy's sign-matrix product (sequential
    fold vs dot: ±1 products are exact, sums reassociate safely within
    tolerance); quantized mode is all-integer; JL property: projected
    distances correlate with input distances on a controlled set."""
    import hashlib

    import numpy as np
    import pytest

    from kgforge.functions.embeddings import random_projection

    rng = np.random.default_rng(5)
    d, k, n = 24, 12, 30
    vecs = rng.normal(size=(n, d)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    signs = np.array(
        [
            [
                1 if hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()[0] >= "8"
                else -1
                for i in range(d)
            ]
            for j in range(k)
        ]
    )
    expected = vecs.astype("float64") @ signs.T
    got = {
        r.id: np.array(r.proj)
        for r in random_projection(df, in_dim=d, out_dim=k).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(expected[i], rel=1e-9)

    qgot = {
        r.id: np.array(r.proj)
        for r in random_projection(df, in_dim=d, out_dim=k, quantize=8).collect()
    }
    qexp = np.floor(vecs.astype("float64") * 8) @ signs.T
    for i in range(n):
        assert (qgot[i] == qexp[i]).all()
        assert qgot[i].dtype.kind in "iu" or all(
            float(x).is_integer() for x in qgot[i]
        )

    # JL sanity: far pair stays farther than a near pair after projection
    a, b = vecs[0], vecs[0] + 0.01 * rng.normal(size=d).astype("float32")
    c = vecs[1]
    df2 = spark.createDataFrame(
        [(0, [float(x) for x in a]), (1, [float(x) for x in b]),
         (2, [float(x) for x in c])],
        "vec_id long, embedding array<float>",
    )
    p = {
        r.id: np.array(r.proj)
        for r in random_projection(df2, in_dim=d, out_dim=k).collect()
    }
    assert np.linalg.norm(p[0] - p[1]) < np.linalg.norm(p[0] - p[2])

    with pytest.raises(ValueError):
        random_projection(df, in_dim=0)


# ---------------------------------------------------------------------
# winsorize — exact per-key discrete-percentile clamping (r5 s6)
# ---------------------------------------------------------------------

def _wins_brute(vals, lo, hi):
    s = sorted(vals)
    n = len(s)
    plo = s[max(-(-n * lo // 100), 1) - 1]
    phi = s[max(-(-n * hi // 100), 1) - 1]
    return [min(max(v, plo), phi) for v in vals]


def test_winsorize_matches_python_replay(spark):
    import hashlib

    from kgforge.functions.sharding import winsorize

    rows = []
    for k in ("a", "b"):
        for i in range(37 if k == "a" else 8):
            h = hashlib.md5(f"w|{k}|{i}".encode()).hexdigest()
            rows.append((k, i, float(int(h[:4], 16) % 1000) / 4))
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = winsorize(df, ["k"], "v", lo_pct=10, hi_pct=90)
    got = {(r.k, r.i): r.v_winsor for r in out.collect()}
    for k in ("a", "b"):
        vals = [v for kk, _, v in rows if kk == k]
        want = _wins_brute(vals, 10, 90)
        idx = [i for kk, i, _ in rows if kk == k]
        for i, w in zip(idx, want):
            assert got[(k, i)] == w, (k, i)


def test_winsorize_edges(spark):
    import pytest

    from kgforge.functions.sharding import winsorize

    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("b", 7.0)], "k string, v double"
    )
    out = {(r.k, r.v): r.v_winsor for r in winsorize(df, ["k"], "v").collect()}
    # singleton group clamps to itself; NULL passes through
    assert out[("a", 5.0)] == 5.0
    assert out[("a", None)] is None
    assert out[("b", 7.0)] == 7.0
    with pytest.raises(ValueError):
        winsorize(df, ["k"], "v", lo_pct=60, hi_pct=40)


def test_quantile_picks_exact_indices_and_one_exchange(spark):
    from kgforge.functions.sharding import quantile_picks

    q = spark.createDataFrame(
        [(1, float(v)) for v in range(1, 11)] + [(2, 7.0)],
        "k long, v double",
    )
    got = {
        (r.k, r.pct): r.pick
        for r in quantile_picks(q, ["k"], "v").collect()
    }
    # n=10: ceil indices 3/5/8/10; singleton key: all picks = the value
    assert got == {
        (1, 25): 3.0, (1, 50): 5.0, (1, 75): 8.0, (1, 95): 10.0,
        (2, 25): 7.0, (2, 50): 7.0, (2, 75): 7.0, (2, 95): 7.0,
    }
    plan = (
        quantile_picks(q, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_asof_nearest_semantics(spark):
    """asof_nearest (r5 s8): closer side wins, exact ties take the
    BACKWARD row (pandas parity), tolerance applies per-direction
    BEFORE the choice, all-null when neither side matches."""
    from kgforge.operators.asof import asof_nearest

    left = spark.createDataFrame(
        [
            (1, "u1", 140),   # b=100 (d40), f=200 (d60) -> backward
            (2, "u1", 180),   # b=100 (d80), f=200 (d20) -> forward
            (3, "u1", 150),   # exact tie d50/d50 -> backward
            (4, "u2", 300),   # no right rows -> nulls
            (5, "u1", 5),     # no backward; f=100 (d95) -> forward
        ],
        "event_id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 100, "r100"), ("u1", 200, "r200")],
        "user string, ts long, rtag string",
    )
    out = {
        r.event_id: (r.rtag_r, r.ts_r)
        for r in asof_nearest(left, right, on="user").collect()
    }
    assert out == {
        1: ("r100", 100),
        2: ("r200", 200),
        3: ("r100", 100),
        4: (None, None),
        5: ("r100", 100),
    }


def test_asof_nearest_tolerance_asymmetry(spark):
    """A nearer but OUT-of-tolerance forward match must not shadow an
    in-tolerance backward match — tolerance is applied inside each
    directional pass, then the choice runs over survivors."""
    from kgforge.operators.asof import asof_nearest

    left = spark.createDataFrame(
        [(1, "u1", 150)], "event_id long, user string, ts long"
    )
    # backward at d=50 (in tolerance 60), forward at d=30 BUT we set
    # tolerance 40: forward d=30 in, backward d=50 out -> forward wins
    right = spark.createDataFrame(
        [("u1", 100, "b"), ("u1", 180, "f")],
        "user string, ts long, rtag string",
    )
    near60 = asof_nearest(left, right, on="user", tolerance=60).collect()[0]
    assert (near60.rtag_r, near60.ts_r) == ("f", 180)  # d30 < d50
    near40 = asof_nearest(left, right, on="user", tolerance=40).collect()[0]
    assert (near40.rtag_r, near40.ts_r) == ("f", 180)
    near20 = asof_nearest(left, right, on="user", tolerance=20).collect()[0]
    assert (near20.rtag_r, near20.ts_r) == (None, None)
    # backward-only survivor: forward farther than tolerance
    right2 = spark.createDataFrame(
        [("u1", 120, "b"), ("u1", 300, "f")],
        "user string, ts long, rtag string",
    )
    near = asof_nearest(left, right2, on="user", tolerance=40).collect()[0]
    assert (near.rtag_r, near.ts_r) == ("b", 120)
