"""Bucket caps on the embedding-LSH joins (VERDICT r02 #1): a dense
embedding mode (boilerplate pages re-embedded to near-identical vectors)
must not explode a (tbl, bucket) key into an O(bucket^2) self-join cell.
Mirrors tests/test_dedup_caps.py for the text-dedup blockers."""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.cache import release_cached
from kgforge.functions import similarity as S

DIM = 16


@pytest.fixture(scope="module")
def dense_mode_corpus(spark):
    """520 vectors: 300 exact copies of one direction (the dense mode),
    200 unique random directions, 10 planted near-dup pairs among the
    uniques (cosine >= ~0.99 via a small perturbation)."""
    rng = np.random.RandomState(31)
    mode = rng.standard_normal(DIM)
    rows = [(i, [float(x) for x in mode]) for i in range(300)]
    uniq = rng.standard_normal((200, DIM))
    for i in range(200):
        rows.append((300 + i, [float(x) for x in uniq[i]]))
    planted = []
    for j in range(10):
        base = uniq[j * 17]
        near = base + rng.standard_normal(DIM) * 0.02
        rows.append((1000 + j, [float(x) for x in near]))
        planted.append((300 + j * 17, 1000 + j))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df.cache(), planted, set(range(300))


def test_pairs_cap_bounds_dense_mode(dense_mode_corpus):
    df, planted, mode_ids = dense_mode_corpus
    pairs = {
        (r.id_a, r.id_b)
        for r in S.cosine_pairs_lsh(df, tau=0.9, max_bucket=50).collect()
    }
    # every planted near-dup pair survives the cap (recall intact: the
    # pair co-buckets away from the mode's code in most tables)
    for a, b in planted:
        assert (a, b) in pairs, (a, b)
    # the 300-copy mode clique (44850 pairs) is excluded: its bucket
    # exceeds the cap in every table
    assert not any(a in mode_ids and b in mode_ids for a, b in pairs)
    assert len(pairs) < 100


def test_pairs_uncapped_returns_mode_clique(dense_mode_corpus):
    """Contrast: max_bucket=None preserves the exhaustive behavior."""
    df, _, mode_ids = dense_mode_corpus
    pairs = {
        (r.id_a, r.id_b)
        for r in S.cosine_pairs_lsh(df, tau=0.9, max_bucket=None).collect()
    }
    clique = {(a, b) for a, b in pairs if a in mode_ids and b in mode_ids}
    assert len(clique) == 300 * 299 // 2


def test_query_join_bounded_by_build_cap(dense_mode_corpus):
    """lsh_query joins against the capped index: a query for a planted
    vector still finds its near-dup, while the mode's bucket rows are
    absent from the corpus side of the join."""
    df, planted, _ = dense_mode_corpus
    index = S.lsh_build(df, max_bucket=50)
    capped = {
        int(r.tbl_n)
        for r in index.bucketed.groupBy("tbl", "bucket")
        .count()
        .agg({"count": "max"})
        .withColumnRenamed("max(count)", "tbl_n")
        .collect()
    }
    assert max(capped) <= 50  # no oversized bucket survives the build
    base_id, near_id = planted[0]
    queries = df.filter(df.vec_id == near_id)
    got = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_query(index, queries, k=3).collect()
    }
    assert (near_id, base_id) in got
    release_cached()
