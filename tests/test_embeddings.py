

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
