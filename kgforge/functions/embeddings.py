"""Embedding-column preparation: L2 normalization and int8 quantization.

Engine-new surface: before a 100 TB corpus's embeddings are ANN-indexed
or shipped to a trainer they are normalized (cosine becomes dot product)
and quantized (4x smaller, cache-resident). Both operators are pure
built-in column expressions over ``array<float>`` — `transform` /
`aggregate` higher-order functions, JVM-side, no Python on the row path.

Determinism note (why the ORACLE covers quantization but not
normalization): the quantizer's scale is a max of absolute values —
EXACT, order-free — and each element is then quantized independently in
double precision, so any engine reproduces it bit-for-bit
(`floor(x/scale*127 + 0.5)` is round-half-up in plain floor arithmetic).
The L2 norm, by contrast, is a floating SUM whose low bits depend on
accumulation order, which no cross-engine contract guarantees —
normalization is pytest-gated (unit norm, cosine invariance) instead.

Expensive arrays are materialized into real columns before any
`transform` that reuses them: higher-order-function subexpressions are
not CSE'd (CLAUDE.md invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "vec_unit"
) -> DataFrame:
    """Add ``out_col`` = the unit-L2 vector (double elements).

    Zero vectors stay zero (no NaN poisoning downstream dot products).
    """
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    df = df.withColumn("__norm", norm)
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.col("__norm")
    )
    zeros = F.transform(F.col(vec_col), lambda _: F.lit(0.0))
    return df.withColumn(
        out_col, F.when(F.col("__norm") > 0, unit).otherwise(zeros)
    ).drop("__norm")


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    out_col: str = "q_vec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = round_half_up(x /
    scale * 127)`` with ``scale = max(|x|)``, so q is in [-127, 127].

    Adds ``scale_col`` (double) and ``out_col`` (array<int>). A zero
    vector quantizes to zeros with scale 0. Reconstruction
    (`dequantize_int8`) is ``q * scale / 127`` with max elementwise
    error ``scale/254``.
    """
    df = df.withColumn(
        scale_col,
        F.array_max(
            F.transform(F.col(vec_col), lambda x: F.abs(x))
        ).cast("double"),
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") / F.col(scale_col) * 127 + F.lit(0.5)
        ).cast("int"),
    )
    zeros = F.transform(F.col(vec_col), lambda _: F.lit(0).cast("int"))
    return df.withColumn(
        out_col, F.when(F.col(scale_col) > 0, q).otherwise(zeros)
    )


def dequantize_int8(
    df: DataFrame,
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
    out_col: str = "vec_approx",
) -> DataFrame:
    """Reconstruct ``array<double>`` from `quantize_int8` output."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda q: q.cast("double") * F.col(scale_col) / 127,
        ),
    )


def covariance_sums(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """EXACT sufficient statistics for the embedding covariance matrix:
    (i, j, n, s_i, s_j, s_ij) for every ordered dim pair i <= j, where
    s_i = Σ x_i, s_ij = Σ x_i·x_j over all rows.

    The two-phase shape that makes PCA distributed: one mapInPandas
    pass computes per-PARTITION (n, Σx, ΣxᵀX) with a single numpy
    X.T @ X per Arrow batch (never a per-row Python loop, never a
    d²-per-row explode of the data), emitting ONE row of d + d² floats
    per partition — metadata scale. Those few rows explode to (i, j)
    and a plain groupBy sums them; cov[i,j] then derives as
    s_ij/n − (s_i/n)(s_j/n) wherever it's consumed. On integer-valued
    vectors every emitted number is exact (integer sums in doubles are
    associative below 2^53), which is what the driver gate quantizes
    for; float inputs carry the usual partition-order caveat — fit
    quality is unaffected, bit-reproducibility is not promised there.
    """
    import numpy as np
    import pandas as pd

    def partial(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if X.size == 0:
                continue
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
                "d": [len(s)],
            }
        )

    parts = df.select(vec_col).mapInPandas(
        partial, "n long, s array<double>, ss array<double>, d int"
    )
    pairs = parts.select(
        "n", "s", "d",
        F.posexplode("ss").alias("flat", "s_ij"),
    ).select(
        "n",
        (F.col("flat") / F.col("d")).cast("int").alias("i"),
        (F.col("flat") % F.col("d")).cast("int").alias("j"),
        F.element_at("s", (F.col("flat") / F.col("d")).cast("int") + 1)
        .alias("s_i"),
        F.element_at("s", (F.col("flat") % F.col("d")).cast("int") + 1)
        .alias("s_j"),
        "s_ij",
    ).filter(F.col("i") <= F.col("j"))
    return pairs.groupBy("i", "j").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s_i").alias("s_i"),
        F.sum("s_j").alias("s_j"),
        F.sum("s_ij").alias("s_ij"),
    )


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> dict:
    """Principal components from the distributed sufficient statistics:
    {mean: [d], components: [k][d], explained_variance: [k]}.

    The d×d covariance assembles DRIVER-side from `covariance_sums`'
    d(d+1)/2 rows (metadata scale — the data never leaves the
    executors) and numpy's symmetric eigensolver runs on it. Sign
    convention: each component's largest-|coefficient| entry is made
    positive, so the basis is deterministic when eigenvalues are
    distinct."""
    import numpy as np

    rows = covariance_sums(df, vec_col).collect()
    if not rows:
        raise ValueError("no vectors to fit")
    d = max(r.j for r in rows) + 1
    n = rows[0].n
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        ss[r.i, r.j] = r.s_ij
        ss[r.j, r.i] = r.s_ij
        s[r.i] = r.s_i
        s[r.j] = r.s_j
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": vals[order].tolist(),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted components: adds `out_col`
    (array<double>, length k). One broadcast of the k×d matrix into a
    mapInPandas; per batch a single (X − mean) @ Wᵀ numpy matmul."""
    import numpy as np
    import pandas as pd

    mean = np.asarray(model["mean"])
    W = np.asarray(model["components"])
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def project(batches):
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = (X - mean) @ W.T if X.size else np.zeros((0, W.shape[0]))
            pdf = pdf.copy()
            pdf[out_col] = [r.tolist() for r in out]
            yield pdf

    return df.mapInPandas(project, f"{fields}, {out_col} array<double>")


def hash_features(
    df: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    doc_col: str = "doc_id",
    signed: bool = True,
) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009):
    -> sparse (id, idx, val) triples, the fastText/Vowpal-Wabbit input
    vectorizer with NO vocabulary table.

    idx = md5('fh|' || token) mod dim; ``signed`` adds the +-1 sign hash
    (md5('fs|' || token) leading bit) that makes collision noise
    zero-mean. Everything is integer md5 arithmetic — no fitted state,
    no vocabulary broadcast, stable across runs and engines — so a
    trillion-token corpus vectorizes in one explode + one map-side-
    combining groupBy, and the SAME function applied at train and
    serve time cannot skew. Zero-sum cells are kept (they carry
    collision evidence); filter val != 0 downstream if sparsity
    matters."""
    from kgforge.functions.textstats import _WS

    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(doc_col).alias("id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), _WS)
            ).alias("w"),
        )
    )
    idx = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit("fh|"), F.col("w")), "UTF-8")),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % dim
    )
    if signed:
        sign_digit = F.substring(
            F.md5(F.encode(F.concat(F.lit("fs|"), F.col("w")), "UTF-8")), 1, 1
        )
        val = F.when(sign_digit >= "8", F.lit(1)).otherwise(F.lit(-1))
    else:
        val = F.lit(1)
    return (
        toks.select("id", idx.alias("idx"), val.alias("__v"))
        .groupBy("id", "idx")
        .agg(F.sum("__v").cast("long").alias("val"))
    )


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "rp",
    quantize: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection: -> (id, proj).

    Dimensionality reduction with NO fitted state (the PCA alternative
    when you can't afford a training pass): the sign matrix is a pure
    function of (seed, i, j) via md5, PRECOMPUTED driver-side with
    hashlib and inlined as literal arrays — the data plane pays
    out_dim zip_with/aggregate folds per row, zero hashing, zero
    shuffles, and any engine can re-derive the same matrix from the
    md5 rule (the driver gate's DuckDB oracle does). ``quantize=q``
    first maps components through ``floor(x * q)`` (exact when q is a
    power of two — an exponent shift) making the projection all-BIGINT
    for cross-engine-exact artifacts; unquantized output is a
    deterministic sequential float fold (pytest-pinned vs numpy).
    """
    import hashlib

    if in_dim < 1 or out_dim < 1:
        raise ValueError("in_dim and out_dim must be >= 1")
    signs = [
        [
            1
            if hashlib.md5(f"{seed}|{i}|{j}".encode()).hexdigest()[0] >= "8"
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]
    v = F.col(vec_col)
    if quantize is not None:
        vq = F.transform(v, lambda x: F.floor(x * quantize).cast("long"))
        zero = F.lit(0).cast("long")
    else:
        vq = F.transform(v, lambda x: x.cast("double"))
        zero = F.lit(0.0)
    # materialize the (possibly quantized) vector ONCE — HOF
    # subexpressions are not CSE'd across the out_dim folds
    base = df.select(F.col(id_col).alias("id"), vq.alias("__v"))
    outs = [
        F.aggregate(
            F.zip_with(
                F.col("__v"),
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: x * s,
            ),
            zero,
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    return base.select("id", F.array(*outs).alias("proj"))


def pq_fit(
    df: DataFrame,
    m: int,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "pq",
    scale: int = 8,
) -> list:
    """Sampled product-quantization codebook: ``codebook[j][r]`` is the
    j-th subvector (dim d/m) of the r-th sampled row, integer-quantized
    as ``floor(x * scale)``.

    The k codebook rows are the corpus rows with the SMALLEST
    ``md5(seed|id)`` — a deterministic uniform draw with no engine RNG
    (the `random_walks`/`stratified_sample` discipline), so a SQL oracle
    replays the fit exactly. Sampled codebooks are the classic
    random-codebook PQ baseline (Jégou et al., TPAMI 2011 note the small
    recall gap vs k-means codebooks); for the quality path at
    production scale, fit centroids with `similarity.ivf_build`'s
    k-means per subspace and pass them here — `pq_encode` only needs the
    nested list. Driver-side state is k×d integers (tiny, broadcast in
    the encode expressions).
    """
    if m <= 0 or k <= 0:
        raise ValueError("pq_fit: m and k must be positive")
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x * scale).cast("long"),
            ).alias("q"),
        )
        .orderBy(
            F.md5(F.concat(F.lit(seed + "|"), F.col("id").cast("string"))),
            "id",
        )
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"pq_fit: need >= {k} rows, have {len(rows)}")
    d = len(rows[0]["q"])
    if d % m != 0:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    sd = d // m
    return [
        [list(r["q"][j * sd:(j + 1) * sd]) for r in rows]
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebook: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 8,
) -> DataFrame:
    """Product-quantization codes: one row per (id, sub) with the
    assigned centroid ``code`` and its exact integer distance ``dist``.

    The 100 TB story: PQ is how billion-vector corpora fit in memory —
    64 float32 dims (256 B) become m uint8 codes (m B, 32x at m=8), and
    ANN scans then score candidates from an m×k lookup table
    (`pq_adc_scores`) without touching raw vectors. Everything here is
    built-in expressions: the vector is integer-quantized ONCE into a
    materialized column (HOF-CSE rule), each subspace's k candidate
    distances are flat literal-index arithmetic (no joins, no Python),
    and argmin is `array_min` over (dist, rank) structs — ties break to
    the smallest rank, so the result is a pure function of (data,
    codebook) and a DuckDB oracle replays it row-for-row.
    """
    m = len(codebook)
    k = len(codebook[0])
    sd = len(codebook[0][0])
    q = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x * scale).cast("long")
        ).alias("__q"),
    )
    subs = []
    for j in range(m):
        cands = []
        for r in range(k):
            dist = None
            for i in range(sd):
                t = F.element_at(F.col("__q"), j * sd + i + 1) - F.lit(
                    int(codebook[j][r][i])
                )
                dist = t * t if dist is None else dist + t * t
            cands.append(
                F.struct(
                    dist.cast("long").alias("d"),
                    F.lit(r).cast("long").alias("r"),
                )
            )
        best = F.array_min(F.array(*cands))
        subs.append(
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                best["r"].alias("code"),
                best["d"].alias("dist"),
            )
        )
    return q.select(
        id_col, F.explode(F.array(*subs)).alias("s")
    ).select(
        id_col,
        F.col("s.sub").alias("sub"),
        F.col("s.code").alias("code"),
        F.col("s.dist").alias("dist"),
    )


def pq_adc_scores(
    codes: DataFrame,
    codebook: list,
    query: list,
    id_col: str = "vec_id",
    scale: int = 8,
) -> DataFrame:
    """Asymmetric-distance (ADC) scores for one query over PQ codes:
    (id, adc_dist) where adc_dist = Σ_j table[j][code_j] and
    table[j][r] = exact integer distance between the query's quantized
    j-th subvector and centroid r. The table is m×k literals folded into
    an `element_at` lookup — scoring a billion codes is one expression
    scan plus a fine-grained (id) sum, no joins."""
    import math

    m = len(codebook)
    k = len(codebook[0])
    sd = len(codebook[0][0])
    if len(query) != m * sd:
        raise ValueError("pq_adc_scores: query dim mismatch")
    qq = [int(math.floor(x * scale)) for x in query]
    table = [
        [
            sum(
                (qq[j * sd + i] - int(codebook[j][r][i])) ** 2
                for i in range(sd)
            )
            for r in range(k)
        ]
        for j in range(m)
    ]
    lut = F.array(
        *[
            F.array(*[F.lit(table[j][r]) for r in range(k)])
            for j in range(m)
        ]
    )
    w = F.element_at(
        F.element_at(lut, (F.col("sub") + 1).cast("int")),
        (F.col("code") + 1).cast("int"),
    )
    return codes.groupBy(id_col).agg(
        F.sum(w).cast("long").alias("adc_dist")
    )
