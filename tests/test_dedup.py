

def test_duplicate_spans_merging_and_self_repeat(spark):
    """duplicate_spans (r5): corpus-wide duplicated 3-gram positions
    merge into maximal spans; self-repetition inside one doc counts;
    unique text yields no rows."""
    from kgforge.functions.dedup import duplicate_spans

    shared = "alpha beta gamma delta"          # 4 tokens, 2 dup 3-grams
    docs = spark.createDataFrame(
        [
            (0, f"{shared} zig zag one two three four five"),
            (1, f"nine eight seven {shared} six ten"),
            (2, "solo only words that never repeat anywhere here"),
            (3, "rep one rep one rep one rep one rep one rep one"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.span_start, r.span_end): r.n_shingles
        for r in duplicate_spans(docs, n=3).collect()
    }
    # docs 0/1 share 'alpha beta gamma' + 'beta gamma delta': positions
    # 0,1 in doc 0 (span tokens 0..3) and 3,4 in doc 1 (tokens 3..6)
    assert out[(0, 0, 3)] == 2
    assert out[(1, 3, 6)] == 2
    # doc 3: 'rep one rep' / 'one rep one' repeat within the SAME doc;
    # every position is duplicated -> one maximal span over all tokens
    assert out[(3, 0, 11)] == 10
    assert not any(k[0] == 2 for k in out)


def test_duplicate_spans_randomized_brute_force(spark):
    """Full-output equality vs an independent Python reference on a
    randomized corpus (fixed seed): same fingerprint rule, same
    corpus-wide count threshold, same island merge."""
    import random
    from collections import Counter

    from kgforge.functions.dedup import duplicate_spans

    rng = random.Random(7)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for _ in range(30)
    ]
    n = 3
    grams: Counter = Counter()
    pos = {}
    for d, t in enumerate(texts):
        toks = t.split(" ")
        pos[d] = []
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            grams[g] += 1
            pos[d].append((i, g))
    expect = set()
    for d in pos:
        dup = sorted(i for i, g in pos[d] if grams[g] >= 2)
        if not dup:
            continue
        start, prev, cnt = dup[0], dup[0], 1
        for p in dup[1:]:
            if p - prev > n:
                expect.add((d, start, prev + n - 1, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        expect.add((d, start, prev + n - 1, cnt))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_shingles)
        for r in duplicate_spans(docs, n=n).collect()
    }
    assert got == expect


def test_dedup_clusters_transitive_and_rep_choice(spark):
    """Pairs (1,2),(2,3) cluster transitively; the representative is
    the max-quality member (tie -> min id); unpaired rows are singleton
    reps of themselves."""
    from kgforge.functions.dedup import dedup_clusters

    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 5), (5, 7), (6, 7), (9, 1)],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.cluster, r.is_rep)
        for r in dedup_clusters(df, pairs, quality_col="q").collect()
    }
    assert out[1] == (1, 0) and out[2] == (1, 1) and out[3] == (1, 0)
    assert out[5] == (5, 1) and out[6] == (5, 0)  # tie on q -> min id
    assert out[4] == (4, 1) and out[9] == (9, 1)  # singletons
    # no quality: min id wins
    noq = {
        r.doc_id: r.is_rep
        for r in dedup_clusters(df, pairs).collect()
    }
    assert noq[1] == 1 and noq[2] == 0 and noq[5] == 1
    # exactly one rep per cluster
    from collections import Counter
    reps = Counter()
    for r in dedup_clusters(df, pairs, quality_col="q").collect():
        reps[r.cluster] += r.is_rep
    assert all(v == 1 for v in reps.values())


def test_keep_best_quality_argmax_and_ties(spark):
    from kgforge.functions.dedup import keep_best

    d = spark.createDataFrame(
        [
            (1, "same text", 5), (2, "same text", 9), (3, "same text", 9),
            (4, "unique", 1),
            (5, "other dup", 3), (6, "other dup", 3),
        ],
        "doc_id long, text string, n_chars long",
    )
    got = sorted(
        (r.id, r.kept_id) for r in keep_best(d).collect()
    )
    # {1,2,3}: best q=9, tie -> min id 2; {5,6}: tie -> 5; 4 absent
    assert got == [(1, 2), (3, 2), (6, 5)]


def test_keep_best_no_window_single_agg_plan(spark):
    from kgforge.functions.dedup import keep_best

    d = spark.createDataFrame(
        [(1, "t", 1)], "doc_id long, text string, n_chars long"
    )
    plan = keep_best(d)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Python" not in plan
