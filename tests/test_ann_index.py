"""ANN index lifecycle: build once / persist / query many, with n_probe
calibrated to a recall target on a held-out sample (VERDICT r01: the
per-call KMeans fit + probe-half-the-cells default defeated the index)."""

from __future__ import annotations

import numpy as np
import pytest

from kgforge.functions import similarity as S


@pytest.fixture(scope="module")
def clustered(spark):
    """8 well-separated clusters in 16-dim: the regime where IVF pays off."""
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 5
    rows = []
    for i in range(800):
        c = i % 8
        v = centers[c] + rng.standard_normal(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = spark.createDataFrame(rows[:30], "vec_id bigint, embedding array<float>")
    return corpus.cache(), queries.cache()


def _recall(got_df, exact_df):
    got = {(r.query_id, r.neighbor_id) for r in got_df.collect()}
    exact = {(r.query_id, r.neighbor_id) for r in exact_df.collect()}
    return len(got & exact) / len(exact)


def test_ivf_low_probe_recall_on_clustered(clustered):
    """n_probe=3 (not half the cells) reaches >=0.9 recall when the corpus
    is actually clustered — the index does its job."""
    corpus, queries = clustered
    index = S.ivf_build(corpus, n_cells=8)
    got = S.ivf_query(index, queries, k=5, n_probe=3)
    exact = S.brute_force_topk(corpus, queries, k=5)
    assert _recall(got, exact) >= 0.9


def test_ivf_calibrate_picks_small_probe(clustered):
    corpus, queries = clustered
    index = S.ivf_build(corpus, n_cells=8)
    n_probe = S.ivf_calibrate(index, queries, k=5, target_recall=0.9)
    assert 1 <= n_probe <= 4  # clustered corpus needs few probes
    assert index.default_n_probe == n_probe


def test_ivf_autocalibrates_at_build(clustered):
    """An un-calibrated build no longer falls back to probing half the
    cells: ivf_build self-calibrates on a sampled query set (VERDICT r02
    #4), landing a small probe count on clustered data."""
    corpus, _ = clustered
    index = S.ivf_build(corpus, n_cells=8)
    assert 1 <= index.default_n_probe <= 4
    uncal = S.ivf_build(corpus, n_cells=8, calibrate=False)
    assert uncal.default_n_probe == 4  # the documented fallback, opt-in


def test_index_save_is_idempotent(clustered, workdir):
    """Re-saving to the same path must not half-overwrite the index
    (ADVICE r02: saveAsTextFile threw on existing meta dirs)."""
    corpus, queries = clustered
    ivf = S.ivf_build(corpus, n_cells=8, default_n_probe=3)
    ivf.save(f"{workdir}/ivf2")
    ivf.save(f"{workdir}/ivf2")
    assert S.IvfIndex.load(corpus.sparkSession, f"{workdir}/ivf2").default_n_probe == 3
    lsh = S.lsh_build(corpus, n_planes=4, n_tables=4)
    lsh.save(f"{workdir}/lsh2")
    lsh.save(f"{workdir}/lsh2")
    assert S.LshIndex.load(corpus.sparkSession, f"{workdir}/lsh2").planes.shape == (4, 4, 16)


def test_ivf_save_load_roundtrip(clustered, workdir):
    corpus, queries = clustered
    index = S.ivf_build(corpus, n_cells=8, default_n_probe=3)
    index.save(f"{workdir}/ivf")
    spark = corpus.sparkSession
    loaded = S.IvfIndex.load(spark, f"{workdir}/ivf")
    assert loaded.n_cells == 8 and loaded.default_n_probe == 3
    a = {tuple(r) for r in S.ivf_query(index, queries, k=5).collect()}
    b = {tuple(r) for r in S.ivf_query(loaded, queries, k=5).collect()}
    assert a == b


def test_ivf_oneshot_matches_lifecycle(clustered):
    """The compatibility wrapper and build+query produce identical output."""
    corpus, queries = clustered
    oneshot = {
        tuple(r)
        for r in S.ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=3).collect()
    }
    index = S.ivf_build(corpus, n_cells=8)
    split = {
        tuple(r) for r in S.ivf_query(index, queries, k=5, n_probe=3).collect()
    }
    assert oneshot == split


def test_ivf_oneshot_caches_index_across_calls(clustered, monkeypatch):
    """VERDICT r03 #5: two ivf_topk calls over the SAME corpus plan fit
    k-means once — the second call hits the session-scoped index cache
    (semanticHash + sameSemantics keyed)."""
    corpus, queries = clustered
    S._IVF_TOPK_CACHE.clear()
    fits = []
    real_build = S.ivf_build

    def counting_build(*args, **kwargs):
        fits.append(1)
        return real_build(*args, **kwargs)

    monkeypatch.setattr(S, "ivf_build", counting_build)
    a = S.ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=3).collect()
    b = S.ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=3).collect()
    assert len(fits) == 1
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    # a DIFFERENT corpus plan misses the cache and fits again
    S.ivf_topk(
        corpus.filter("vec_id < 400"), queries, k=5, n_cells=8, n_probe=3
    ).collect()
    assert len(fits) == 2


def test_lsh_save_load_roundtrip(clustered, workdir):
    corpus, queries = clustered
    index = S.lsh_build(corpus, n_planes=4, n_tables=16)
    index.save(f"{workdir}/lsh")
    loaded = S.LshIndex.load(corpus.sparkSession, f"{workdir}/lsh")
    a = {tuple(r) for r in S.lsh_query(index, queries, k=5).collect()}
    b = {tuple(r) for r in S.lsh_query(loaded, queries, k=5).collect()}
    assert a == b
    exact = S.brute_force_topk(corpus, queries, k=5)
    assert _recall(S.lsh_query(index, queries, k=5), exact) >= 0.7


def test_cosine_pairs_lsh_recall(spark):
    """Embedding near-dup: the LSH scale path recovers the exact pair set
    on the variant-planted driver embeddings (wide threshold gap)."""
    from kgforge import driver_queries as dq

    corpus = dq._embeddings_with_near_variants(spark, "/root/testdata/sf0.001")
    exact = {tuple(r) for r in S.cosine_pairs_exact(corpus, 0.75).collect()}
    lsh = {tuple(r) for r in S.cosine_pairs_lsh(corpus, 0.75).collect()}
    assert exact, "planted variants must produce pairs"
    assert len(exact & lsh) / len(exact) >= 0.95
    # verification step: LSH never fabricates below-threshold pairs
    assert lsh <= exact
