"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:

- **brute-force cosine top-k** — the exact baseline. Dot products are pure
  built-in expressions (`zip_with` + `aggregate`), evaluated in double
  precision with strict left-to-right accumulation so the oracle (DuckDB
  `list_cosine_similarity` over DOUBLE[]) agrees. The query side is tiny and
  broadcast; the corpus side streams — no shuffle at all, one pass.
- **random-hyperplane LSH (sign bits)** — the scale path. P seeded
  hyperplanes are embedded as literal arrays (driver-side numpy, fixed
  seed), sign bits become a bucket id; query/corpus join on
  (table_idx, bucket). Recall is tested against the brute-force baseline in
  pytest. Defaults (4 planes x 16 tables) are tuned for weakly-clustered
  corpora (driver embeddings: mean top-1 cosine ~0.37); raise n_planes for
  strongly-clustered real embedding spaces to shrink buckets.

At 100 TB the brute-force path is per-partition (broadcasted queries, local
top-k via window over candidate scores), so the only exchange is the final
k-per-query reduction — this is the canonical "broadcast the small side"
shape, not a crossJoin shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HP_SEED = 4242


def dot_d(a: Column, b: Column) -> Column:
    """Double-precision dot product, strict left-to-right accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_d(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot_d(a, b) / (norm_d(a) * norm_d(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rk), self-match excluded.

    queries is expected to be small -> broadcast; rank ties break on
    neighbor_id so the output is deterministic across engines.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = q.crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    rng = np.random.RandomState(_HP_SEED)
    return rng.standard_normal((n_tables, n_planes, dim))


def _bucket_udf(planes: np.ndarray):
    """Vectorized Arrow UDF: embedding -> array of per-table bucket ids.

    One BLAS matmul per batch ((batch x dim) @ (dim x tables*planes)) beats
    the pure-expression alternative: tables*planes separate `aggregate`
    dot-product expressions blow past codegen limits and fall back to
    interpreted evaluation (~40x slower measured at 10k rows).
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    n_tables, n_planes, dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, dim).T  # dim x (T*P)
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ flat > 0).reshape(len(vecs), n_tables, n_planes)
        codes = (signs * pows[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(codes))

    return buckets


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_probe: int | None = None,
    seed: int = _HP_SEED,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer.

    Corpus rows are assigned to their nearest of `n_cells` centroids
    (pyspark.ml KMeans, seeded); each query probes its `n_probe` nearest
    cells and exact-cosine re-ranks only those cells' members. The
    cell-membership join is an equi-join on the cell id — the IVF analogue
    of the LSH bucket join — and centroids ride as literal arrays, so the
    query side needs no model object at execution time.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n_cells = n_cells or max(2, int(corpus.count() ** 0.5 / 2))
    if n_probe is None:
        # default for weakly-clustered corpora (driver embeddings: mean
        # top-1 cosine ~0.37): probe half the cells. Strongly-clustered
        # real embedding spaces can drop this to 2-3.
        n_probe = max(3, (n_cells + 1) // 2)
    feats = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(feats)
    assigned = model.transform(feats).select(
        "neighbor_id", "cv", F.col("prediction").alias("cell")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # rank cells by cosine to the query; probe the top n_probe
    scored_cells = F.transform(
        cent_lit, lambda c, i: F.struct(
            (-cosine_sim(F.col("qv"), c)).alias("neg"), i.alias("cell")
        )
    )
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.slice(F.array_sort(scored_cells), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "qv", F.col("probe.cell").alias("cell"))
    cands = probes.join(assigned, on="cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidates = corpus rows sharing a (table, bucket) with the query in any
    of n_tables tables; exact cosine re-rank of candidates only. Join is an
    equi-join on (table_idx, bucket) — shuffle keyed by bucket, never a cross
    product; the hyperplane literals are constant-folded by Catalyst.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, n_tables)
    bucket_udf = _bucket_udf(planes)

    def with_buckets(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vecc).alias(f"{out_id}_v"),
            F.posexplode(bucket_udf(F.col(vecc))).alias("tbl", "bucket"),
        )

    qb = with_buckets(queries, id_col, vec_col, "query_id")
    cb = with_buckets(corpus, id_col, vec_col, "neighbor_id")
    cands = (
        qb.join(cb, on=["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("query_id_v"), F.col("neighbor_id_v")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk")
    )
