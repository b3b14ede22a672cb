"""M4: MinHash-LSH linking + connected-components canonicalization."""

import random

from pyspark.sql import functions as F

from kgforge.operators.canon import connected_components
from kgforge.operators.link import (
    link_map,
    minhash_udf,  # noqa: F401  (imported to assert it builds sessionless)
    name_match_score,
    normalize_name,
)


def test_score_exact_casefold():
    assert name_match_score("MONA IVANOVA", "Mona Ivanova") == 1.0


def test_score_initial_expansion():
    assert name_match_score("J. Dufresne", "Jonas Dufresne") > 0
    assert name_match_score("Mona I.", "Mona Ivanova") > 0


def test_score_rejects_different_entities():
    # shared first+last tokens must NOT merge distinct titles
    assert name_match_score("The Iron Tide", "The Broken Tide") == 0.0
    # different people with the same surname must not merge
    assert name_match_score("Rosa Xu", "Ingrid Xu") == 0.0
    # initial with wrong letter
    assert name_match_score("A. Dufresne", "Jonas Dufresne") == 0.0
    # different token counts are not abbreviations
    assert name_match_score("Jonas", "Jonas Dufresne") == 0.0


def test_normalize_name():
    assert normalize_name("  Mona   IVANOVA ") == "mona ivanova"


def test_link_map_clusters(spark):
    rows = [
        ("Person", "Mona I."),
        ("Person", "Mona Ivanova"),
        ("Person", "MONA IVANOVA"),
        ("Person", "M. Ivanova"),
        ("Person", "Vera Ueda"),
        ("Person", "Rosa Xu"),
        ("Person", "Ingrid Xu"),
        ("Movie", "The Iron Tide"),
        ("Movie", "The Broken Tide"),
    ]
    mentions = spark.createDataFrame(rows, "label string, key string")
    lm = {
        (r["label"], r["key"]): r["canon_key"]
        for r in link_map(mentions).collect()
    }
    # transitively-closed alias cluster, most-complete representative
    assert lm[("Person", "Mona I.")] == "Mona Ivanova"
    assert lm[("Person", "MONA IVANOVA")] == "Mona Ivanova"
    assert lm[("Person", "M. Ivanova")] == "Mona Ivanova"
    # non-aliases stay put
    assert lm[("Person", "Vera Ueda")] == "Vera Ueda"
    assert lm[("Person", "Rosa Xu")] == "Rosa Xu"
    assert lm[("Person", "Ingrid Xu")] == "Ingrid Xu"
    assert lm[("Movie", "The Iron Tide")] == "The Iron Tide"
    assert lm[("Movie", "The Broken Tide")] == "The Broken Tide"


def _uf_oracle(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully canonicalize: component = min member id
    comp = {}
    for x in range(n):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_cc_matches_union_find_oracle(spark):
    rng = random.Random(17)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(vdf, edf).collect()
    }
    want = _uf_oracle(n, edges)
    assert got == want


def test_cc_transitive_chain(spark):
    # chains only closed transitively (FIXTURES §4)
    vdf = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edf = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(vdf, edf).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_cc_supernode_star(spark):
    # one hub connected to everyone (the "United States" skew shape)
    n = 300
    vdf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame([(0, i) for i in range(1, n)], "src long, dst long")
    got = connected_components(vdf, edf)
    assert got.select(F.count_distinct("component")).collect()[0][0] == 1


def test_survivorship_majority_ties_and_nulls(spark):
    from kgforge.operators.canon import survivorship

    rows = [
        # cluster 1: 'x' wins 2-1; name full tie -> lexicographic min
        (1, "x", "bob"),
        (1, "x", "alice"),
        (1, "y", "carol"),
        # cluster 2: 2-2 tie on seg -> smaller value 'a' wins; NULLs
        # don't vote
        (2, "b", None),
        (2, "b", "zed"),
        (2, "a", None),
        (2, "a", None),
        # cluster 3: all-NULL attr resolves to NULL
        (3, None, "solo"),
    ]
    df = spark.createDataFrame(rows, "cid long, seg string, name string")
    got = {
        r.cid: (r.n_members, r.seg, r.name)
        for r in survivorship(df, "cid", ["seg", "name"]).collect()
    }
    assert got == {
        1: (3, "x", "alice"),
        2: (4, "a", "zed"),
        3: (1, None, "solo"),
    }


def test_pair_scores_agreement_and_threshold(spark):
    from kgforge.operators.canon import pair_scores

    recs = spark.createDataFrame(
        [
            (1, "b1", 10, "x"),
            (2, "b1", 10, "y"),
            (3, "b1", 20, "x"),
            (4, "b2", 10, "x"),  # different block: never paired with 1-3
            (5, "b2", None, None),
        ],
        "id long, blk string, f1 int, f2 string",
    )
    feats = [("f1", F.col("f1"), 7), ("f2", F.col("f2"), 3)]
    all_pairs = {
        (r.id_a, r.id_b): (r.agree_f1, r.agree_f2, r.score)
        for r in pair_scores(recs, "id", ["blk"], feats).collect()
    }
    # NULL on either side is NOT agreement (4,5); cross-block absent
    assert all_pairs == {
        (1, 2): (1, 0, 7),
        (1, 3): (0, 1, 3),
        (2, 3): (0, 0, 0),
        (4, 5): (0, 0, 0),
    }
    kept = pair_scores(recs, "id", ["blk"], feats, min_score=5).collect()
    assert {(r.id_a, r.id_b) for r in kept} == {(1, 2)}


def test_pair_scores_block_cap_keeps_smallest_ids(spark):
    from kgforge.operators.canon import pair_scores

    recs = spark.createDataFrame(
        [(i, "b", 1) for i in range(1, 6)], "id long, blk string, f1 int"
    )
    out = pair_scores(
        recs, "id", ["blk"], [("f1", F.col("f1"), 1)], max_block=3
    ).collect()
    # cap keeps ids 1..3 -> exactly C(3,2) pairs
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2), (1, 3), (2, 3)}
