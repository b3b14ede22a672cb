from pyspark.sql import functions as F


def test_covariance_sums_exact_and_layout_independent(spark):
    """Integer-valued vectors: the sufficient statistics equal numpy's
    exactly, on any partition layout."""
    import numpy as np

    from kgforge.functions.embeddings import covariance_sums

    rng = np.random.default_rng(3)
    X = rng.integers(-8, 9, size=(40, 5)).astype(float)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    want_s = X.sum(axis=0)
    want_ss = X.T @ X
    for layout in (df, df.repartition(7)):
        got = {
            (r.i, r.j): (r.n, r.s_i, r.s_j, r.s_ij)
            for r in covariance_sums(layout).collect()
        }
        assert len(got) == 5 * 6 // 2
        for (i, j), (n, s_i, s_j, s_ij) in got.items():
            assert n == 40 and i <= j
            assert (s_i, s_j, s_ij) == (
                want_s[i], want_s[j], want_ss[i, j]
            )


def test_pca_fit_project_matches_numpy(spark):
    """pca_fit reproduces numpy's eigendecomposition of the same
    covariance; projection preserves pairwise distances of the top-k
    subspace."""
    import numpy as np

    from kgforge.functions.embeddings import pca_fit, pca_project

    rng = np.random.default_rng(11)
    base = rng.normal(size=(80, 3)) @ rng.normal(size=(3, 6)) * 4
    X = np.floor(base * 8) / 8  # dyadic: exact sums
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, k=3)
    cov = np.cov(X, rowvar=False, bias=True)
    vals = np.linalg.eigvalsh(cov)[::-1][:3]
    assert np.allclose(model["explained_variance"], vals, rtol=1e-9)
    W = np.asarray(model["components"])
    assert np.allclose(W @ W.T, np.eye(3), atol=1e-9)  # orthonormal
    out = pca_project(df, model).orderBy("vec_id").collect()
    P = np.asarray([r.pca for r in out])
    ref = (X - X.mean(axis=0)) @ W.T
    assert np.allclose(P, ref, atol=1e-9)
    # projected variance = sum of the kept eigenvalues (the dyadic
    # quantization adds tiny full-rank noise, so trace(cov) is only an
    # upper bound)
    assert np.isclose(P.var(axis=0, ddof=0).sum(), vals.sum(), rtol=1e-9)
    assert P.var(axis=0, ddof=0).sum() <= np.trace(cov)


def _pq_df(spark):
    # 4-dim vectors, values already multiples of 1/8 so floor(x*8) is a
    # hand-checkable integer
    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (1, [1.0, 1.0, 0.0, 0.0]),
        (2, [0.125, 0.0, 1.0, 0.875]),
        (3, [1.0, 0.875, 0.125, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_pq_fit_deterministic_and_validates(spark):
    import pytest as _pt

    from kgforge.functions.embeddings import pq_fit

    df = _pq_df(spark)
    cb1 = pq_fit(df, m=2, k=3)
    cb2 = pq_fit(df, m=2, k=3)
    assert cb1 == cb2
    assert len(cb1) == 2 and len(cb1[0]) == 3 and len(cb1[0][0]) == 2
    with _pt.raises(ValueError):
        pq_fit(df, m=3, k=2)  # 4 dims not divisible by 3
    with _pt.raises(ValueError):
        pq_fit(df, m=2, k=99)  # not enough rows
    with _pt.raises(ValueError):
        pq_fit(df, m=0, k=2)


def test_pq_encode_exact_argmin_and_tiebreak(spark):
    from kgforge.functions.embeddings import pq_encode

    # hand codebook: sub 0 centroids [(0,0),(8,8)], sub 1 same
    cb = [[[0, 0], [8, 8]], [[0, 0], [8, 8]]]
    out = {
        (r.vec_id, r.sub): (r.code, r.dist)
        for r in pq_encode(_pq_df(spark), cb).collect()
    }
    # vec 0 = q(0,0,8,8): sub0 -> c0 dist 0; sub1 -> c1 dist 0
    assert out[(0, 0)] == (0, 0) and out[(0, 1)] == (1, 0)
    assert out[(1, 0)] == (1, 0) and out[(1, 1)] == (0, 0)
    # vec 4 = q(4,4,4,4): both centroids at dist 32 -> tie breaks to 0
    assert out[(4, 0)] == (0, 32) and out[(4, 1)] == (0, 32)


def test_pq_codebook_rows_encode_to_zero_dist(spark):
    from kgforge.functions.embeddings import pq_encode, pq_fit

    df = _pq_df(spark)
    cb = pq_fit(df, m=2, k=3)
    enc = pq_encode(df, cb)
    # at least k rows (the sampled ones) must sit at dist 0 per subspace
    zero = (
        enc.filter(F.col("dist") == 0)
        .groupBy("sub")
        .count()
        .collect()
    )
    assert all(r["count"] >= 3 for r in zero)


def test_pq_adc_matches_python_replay(spark):
    import math

    from kgforge.functions.embeddings import (
        pq_adc_scores,
        pq_encode,
        pq_fit,
    )

    df = _pq_df(spark)
    cb = pq_fit(df, m=2, k=2)
    enc = pq_encode(df, cb)
    query = [0.25, 0.75, 0.5, 0.0]
    got = {
        r.vec_id: r.adc_dist
        for r in pq_adc_scores(enc, cb, query).collect()
    }
    # independent replay
    qq = [math.floor(x * 8) for x in query]
    codes = {
        (r.vec_id, r.sub): r.code for r in enc.collect()
    }
    for vid in range(5):
        want = 0
        for j in range(2):
            c = cb[j][codes[(vid, j)]]
            want += sum(
                (qq[j * 2 + i] - c[i]) ** 2 for i in range(2)
            )
        assert got[vid] == want


def test_pq_encode_plan_has_no_python_no_join(spark):
    from kgforge.functions.embeddings import pq_encode

    cb = [[[0, 0], [8, 8]], [[0, 0], [8, 8]]]
    plan = (
        pq_encode(_pq_df(spark), cb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
