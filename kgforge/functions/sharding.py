"""Deterministic corpus sharding: hash splits and token-budget shards.

Engine-new surface: the last mile of a training-data pipeline is handing
the curated corpus to a trainer as (a) reproducible train/val/test splits
and (b) size-bounded shards. Both must be DETERMINISTIC functions of the
data — rerunning the pipeline, on any cluster size, must produce the same
assignment — so neither uses randomness or physical partitioning as an
input.

- `hash_split` assigns each row a split label from the leading hex of an
  md5 over (salt, key): portable across engines (DuckDB md5 matches, the
  threshold compare is plain string order on lowercase hex), stable under
  repartitioning, and salt-switchable for re-rolls.
- `token_shards` assigns each doc the shard `floor(prior_running_tokens /
  budget)` in key order — the deterministic token-offset sharding a
  trainer consumes. The global running sum is computed as a SCALE-SAFE
  two-phase scan (the classic distributed prefix-sum): range-repartition
  by key, per-partition totals hop to the driver (one row per partition —
  metadata scale), each partition then windows locally against its
  broadcast prefix. No `Window.orderBy` without a partition key anywhere
  — that plan collapses 100 TB onto one task.
- `pack_sequences` extends the same prefix-sum to concat-and-chunk
  packing: global token offsets and the span of fixed-size training
  blocks each doc touches.
- `stratified_sample` / `mix_corpus` rebalance the corpus: per-stratum
  keep rates as a pure md5-key filter; per-source token budgets via the
  grouped prefix-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # the split compare reads the first 8 md5 hex chars


def split_bounds(
    splits: list[tuple[str, int]],
) -> list[tuple[str, str]]:
    """(label, integer weight) list -> (exclusive upper 8-hex bound,
    label) cumulative thresholds — shared by the Spark expression and
    any SQL twin so both compare against identical literals."""
    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError("split weights must be non-negative, sum > 0")
    out, acc = [], 0
    for name, w in splits:
        acc += w
        out.append((format(acc * _HEX_SPACE // total, "08x"), name))
    return out


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: list[tuple[str, int]] | None = None,
    salt: str = "kgforge",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label keyed on md5(salt || key).

    Integer weights (e.g. [("train", 98), ("val", 1), ("test", 1)])
    keep the thresholds exact; the last split absorbs the rounding
    remainder. The hash is over the KEY, not the row position, so the
    assignment survives filtering, repartitioning, and re-runs; change
    `salt` to re-roll. Expected fractions are weights/total — exact only
    in expectation (md5 is uniform), like any hash split.
    """
    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    if isinstance(splits, dict):  # {'train': 98, ...} reads naturally
        splits = list(splits.items())
    bounds = split_bounds(splits)
    h = F.substring(
        F.md5(F.encode(F.concat(F.lit(salt), F.col(key_col).cast("string")),
                       "UTF-8")),
        1, 8,
    )
    # forward order: the first (smallest) threshold wins
    c = None
    for bound, name in bounds[:-1]:
        c = (F.when(h < F.lit(bound), F.lit(name)) if c is None
             else c.when(h < F.lit(bound), F.lit(name)))
    c = F.lit(bounds[-1][1]) if c is None else c.otherwise(
        F.lit(bounds[-1][1])
    )
    return df.withColumn(out_col, c)


def token_shards(
    df: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    out_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign shard = floor(prior running weight / budget) in key order.

    A doc lands in the shard where its FIRST token falls; a doc larger
    than the budget still gets one shard (trainers split residuals
    downstream). The running sum is a distributed prefix-sum: partition
    boundaries (range partitioner samples) do NOT affect the result —
    only the key order does — so the output is deterministic on any
    cluster layout. NULL weights count as 0.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    return (
        _prior_running(df, key_col, weight_col, num_partitions)
        .withColumn(out_col, F.floor(F.col("__run") / budget).cast("long"))
        .drop("__run")
    )


def _prior_running(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """df + `__run` = PRIOR running weight (long) in global key order —
    the two-phase distributed prefix-sum shared by `token_shards` and
    `pack_sequences`. NULL weights count 0."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    # materialize ONCE: the range partitioner picks its bounds by
    # sampling, and phase 1 (totals) and phase 2 (local windows) must
    # see the SAME row->partition assignment — two lazy evaluations can
    # sample different bounds and silently mis-prefix. (The RESULT is
    # still partitioning-independent; only the two phases' internal
    # view must agree.)
    parts = (
        df.repartitionByRange(n, F.col(key_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # phase 1: per-partition totals -> driver (one row per partition)
    totals = sorted(
        parts.groupBy("__pid").agg(F.sum(w).alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    prefix, acc = [], 0
    for r in totals:
        prefix.append((r["__pid"], acc))
        acc += r["__t"] or 0
    pref_df = spark.createDataFrame(prefix, "__pid int, __prefix long")
    # phase 2: local window per partition + broadcast prefix offset
    win = Window.partitionBy("__pid").orderBy(key_col)
    return (
        parts.join(F.broadcast(pref_df), on="__pid")
        .withColumn("__run", F.sum(w).over(win) - w + F.col("__prefix"))
        .drop("__pid", "__prefix")
    )


def pack_sequences(
    df: DataFrame,
    block: int,
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: map each doc to its training
    blocks.

    The GPT-style packing a trainer consumes: all docs are concatenated
    in key order and the token stream is cut into fixed ``block``-token
    sequences; a doc's tokens land at a global offset and may straddle a
    block boundary. Adds BIGINT columns:

    - ``offset`` — global token offset of the doc's first token;
    - ``first_block`` / ``last_block`` — the blocks the doc's tokens
      touch (``floor(offset / block)`` .. ``floor((offset + w - 1) /
      block)``; an empty/NULL-weight doc "touches" only the block at its
      offset);
    - ``n_blocks`` — ``last_block - first_block + 1`` (straddle count;
      ``n_blocks > 1`` means the doc crosses boundaries).

    Deterministic on any cluster layout: the offsets come from the same
    two-phase distributed prefix-sum as `token_shards` (range
    repartition by key, per-partition totals to the driver — metadata
    scale — then local windows against the broadcast prefix). No global
    Window.orderBy anywhere.
    """
    if block <= 0:
        raise ValueError("block must be positive")
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    first = F.floor(F.col("offset") / block).cast("long")
    last = F.when(
        w > 0, F.floor((F.col("offset") + w - 1) / block).cast("long")
    ).otherwise(first)
    return (
        _prior_running(df, key_col, weight_col, num_partitions)
        .withColumnRenamed("__run", "offset")
        .withColumn("first_block", first)
        .withColumn("last_block", last)
        .withColumn(
            "n_blocks",
            (F.col("last_block") - F.col("first_block") + 1).cast("long"),
        )
    )


def mix_corpus(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    weight_col: str = "n_tokens",
    salt: str = "kgforge-mix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic domain mixing: per-source token budgets.

    The mixture-weighting stage of a training-data pipeline ("30 B
    tokens of web, 5 B of code, ..."): docs are ordered within each
    source by md5(salt || key) — a deterministic uniform shuffle — and
    kept while the source's PRIOR running weight is below its budget
    (the boundary doc is included, so each source overshoots by at most
    one doc). Sources without a budget drop. The selection depends only
    on (key, salt, budgets) — never on physical layout — so re-runs and
    cluster-size changes reproduce the same mixture; change `salt` to
    re-roll.

    100-TB shape: generalizes `token_shards`' two-phase distributed
    prefix-sum to GROUPED prefixes. Range-repartition by (source, hash,
    key) so a hot source spreads over many contiguous partitions; ship
    per-(partition, source) totals to the driver (numPartitions x
    n_sources rows — metadata scale); window locally per (partition,
    source) against the broadcast per-source prefix. No
    Window.partitionBy(source) anywhere — that plan would put a
    90%-of-corpus source on ONE task.
    """
    if not budgets:
        raise ValueError("budgets must be non-empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be non-negative")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    h = F.md5(
        F.encode(
            F.concat(F.lit(salt), F.col(key_col).cast("string")), "UTF-8"
        )
    )
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    bdf = spark.createDataFrame(
        sorted(budgets.items()), f"{source_col} string, __budget long"
    )
    base = df.join(F.broadcast(bdf), on=source_col).withColumn("__h", h)
    # same one-materialization rule as token_shards: both phases must
    # see the same row->partition assignment
    parts = (
        base.repartitionByRange(
            n, F.col(source_col), F.col("__h"), F.col(key_col)
        )
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = (
        parts.groupBy("__pid", source_col).agg(F.sum(w).alias("__t"))
    ).collect()
    acc: dict[str, int] = {}
    rows = []
    # within a source, ascending __pid IS ascending (hash, key) order:
    # the range partitioner's composite ranges keep each source's rows
    # contiguous across partitions
    for r in sorted(totals, key=lambda r: (r[source_col], r["__pid"])):
        rows.append((r["__pid"], r[source_col], acc.get(r[source_col], 0)))
        acc[r[source_col]] = acc.get(r[source_col], 0) + (r["__t"] or 0)
    pref = spark.createDataFrame(
        rows, f"__pid int, {source_col} string, __prefix long"
    )
    win = Window.partitionBy("__pid", source_col).orderBy("__h", key_col)
    return (
        parts.join(F.broadcast(pref), on=["__pid", source_col])
        .withColumn("__run", F.sum(w).over(win) - w + F.col("__prefix"))
        .filter(F.col("__run") < F.col("__budget"))
        .drop("__pid", "__prefix", "__run", "__budget", "__h")
    )


def sample_bound(num: int, den: int) -> str:
    """Keep-rate num/den -> exclusive 8-hex md5 threshold (same literal
    on both engines; shares `_HEX_SPACE` with split_bounds)."""
    if den <= 0 or num < 0:
        raise ValueError("rate must be num >= 0, den > 0")
    return format(min(num, den) * _HEX_SPACE // den, "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, tuple[int, int]],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "kgforge",
    default_rate: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Deterministic per-stratum downsampling (corpus rebalancing).

    The standard pretraining-mix move — downsample over-represented
    strata (a language, a domain, a crawl snapshot) at fixed rates —
    implemented as a pure filter on md5(salt || key): keep a row iff its
    leading 8 hash hex < the stratum's `sample_bound(num, den)`. Like
    `hash_split`, the decision is a function of the KEY only, so it is
    exact-reproducible on any cluster layout, stable under re-runs, and
    a row kept at rate 1/4 is also kept at 1/2 (nested samples for
    ablations). Rates are integer fractions; expected (not exact) keep
    fraction is num/den. num >= den keeps the whole stratum; num == 0
    drops it. One WholeStageCodegen filter — no shuffle, no sort.
    """
    items = sorted(rates.items())
    h = F.substring(
        F.md5(
            F.encode(
                F.concat(F.lit(salt), F.col(key_col).cast("string")), "UTF-8"
            )
        ),
        1,
        8,
    )

    def keep_for(num: int, den: int):
        if num >= den:
            return F.lit(True)
        if num <= 0:
            return F.lit(False)
        return h < F.lit(sample_bound(num, den))

    cond = keep_for(*default_rate)
    for stratum, (num, den) in items:
        cond = F.when(
            F.col(strata_col) == F.lit(stratum), keep_for(num, den)
        ).otherwise(cond)
    return df.filter(cond)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    base_rate: tuple[int, int] = (1, 1),
    key_col: str = "doc_id",
    salt: str = "kgforge",
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    ``min(1, weight * num / den)`` — the DCLM/FineWeb-style soft quality
    resample (rows scored higher survive proportionally more often)
    without any engine RNG.

    ``weight_col`` must be a non-negative INTEGER column (quantize float
    quality scores first — integer weights keep the decision exact and
    cross-engine replayable). Keep iff ``h * den < weight * num * 16^8``
    where h is the leading-8-hex md5(salt || key) as an integer: a pure
    scan-side filter (no shuffle), a function of (salt, key, weight)
    only — layout-independent, re-run-stable — and MONOTONE: a row kept
    at weight w stays kept at any w' > w and at any higher base rate
    (nested samples for ablations, like stratified_sample). weight *
    num >= den keeps the row always; weight 0 (or NULL, or negative)
    drops it. The compare runs in DECIMAL so no intermediate overflows.
    """
    num, den = base_rate
    if den <= 0 or num < 0:
        raise ValueError("base_rate must be (num >= 0, den > 0)")
    h_int = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat(F.lit(salt), F.col(key_col).cast("string")),
                    "UTF-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(20,0)")
    rhs = (
        F.col(weight_col).cast("decimal(20,0)")
        * F.lit(num)
        * F.lit(_HEX_SPACE)
    )
    return df.filter(h_int * F.lit(den) < rhs)


def sample_exact_k(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "kgforge",
) -> DataFrame:
    """EXACT-size deterministic per-stratum sample: the k rows of each
    stratum with the smallest md5(salt || key).

    The companion to `stratified_sample` when the budget is a COUNT,
    not a rate (eval-set carving, per-domain caps, fixed-size ablation
    slices). Hash order is a uniform random permutation of each stratum
    that is a pure function of (salt, key): exact-reproducible on any
    cluster layout, stable under re-runs, and monotone in k (the k=100
    sample contains the k=50 sample — nested like the rate path).
    Larger k just widens the same window; changing `salt` draws an
    independent sample.

    Plan shape: ONE hash-partitioned window (row_number over the
    stratum, ordered by the hash — a shuffle on strata_col) + a filter.
    No global sort, no driver-side state. Skew note: every row of a
    stratum flows through that stratum's window partition, so a single
    gigantic stratum serializes — at that point cap per (stratum,
    hash-prefix bucket) first or use `stratified_sample`'s scan-side
    rate filter, which never shuffles.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    h = F.md5(
        F.encode(
            F.concat(F.lit(salt), F.col(key_col).cast("string")), "UTF-8"
        )
    )
    # secondary key order makes row_number deterministic when keys
    # collide (duplicate key_col values share a hash)
    win = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 16,
    key_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT equi-depth histogram: (bucket, cnt, lo, hi), bucket sizes
    differing by at most one row.

    The profiling primitive behind range partitioners and optimizer
    NDV/selectivity stats — computed exactly, not sampled: global rank
    comes from the SAME two-phase distributed prefix-sum as
    token_shards (range repartition -> one total per partition to the
    driver -> local windows), so no single task ever sees more than its
    partition. A plain ``ntile() OVER (ORDER BY v)`` collapses the
    whole table into ONE ordering task — the shape this avoids. Ties
    break by ``key_col`` (default: the value itself — equal values may
    then straddle a bucket boundary deterministically by range order;
    pass a unique key for full determinism guarantees).
    bucket = floor(rank * n_buckets / total), rank 0-based.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    tie = key_col if key_col is not None else value_col
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.struct(
                F.col(value_col).alias("v"), F.col(tie).alias("k")
            ).alias("__ek")
        )
        .withColumn("__one", F.lit(1))
    )
    ranked = _prior_running(d, "__ek", "__one", num_partitions)
    total = ranked.count()
    if total == 0:
        return ranked.select(
            F.lit(0).cast("long").alias("bucket"),
            F.lit(0).cast("long").alias("cnt"),
            F.col("__ek.v").alias("lo"),
            F.col("__ek.v").alias("hi"),
        ).limit(0)
    return (
        ranked.select(
            F.floor(
                (F.col("__run") * n_buckets) / F.lit(total)
            ).cast("long").alias("bucket"),
            F.col("__ek.v").alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


def winsorize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    out_col: str = "v_winsor",
) -> DataFrame:
    """Per-key winsorization: clamp ``value_col`` into its key's
    [p_lo, p_hi] discrete-percentile band — the outlier-taming stage a
    quality/curation funnel applies before averaging noisy signals.

    EXACT discrete percentiles (the cypher percentileDisc index rule):
    p_q = the max(ceil(n*q/100), 1)-th smallest value, computed with
    pure integer index arithmetic ((n*q + 99) // 100 — no float ceil)
    and picked by row_number, so the bounds are raw value PICKS and the
    clamp is least/greatest — no arithmetic anywhere, every output
    hash-exact cross-engine even on doubles. Ties in the value order
    don't matter: the k-th smallest of a multiset is order-free.

    Shape: one window shuffle keyed on ``key_cols`` (rank + count), a
    2-rows-per-key bounds aggregate, one equi-join back (AQE broadcasts
    the tiny bounds side). NULL values pass through unclamped.
    """
    if not (0 <= lo_pct <= hi_pct <= 100):
        raise ValueError("need 0 <= lo_pct <= hi_pct <= 100")
    keys = list(key_cols)
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(value_col)
    wn = Window.partitionBy(*keys)
    ranked = (
        df.where(v.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wn))
    )
    lo_idx = F.greatest(
        (F.col("__n") * lo_pct + 99) / F.lit(100), F.lit(1)
    ).cast("long")
    hi_idx = F.greatest(
        (F.col("__n") * hi_pct + 99) / F.lit(100), F.lit(1)
    ).cast("long")
    bounds = (
        ranked.withColumn("__lo", lo_idx)
        .withColumn("__hi", hi_idx)
        .where((F.col("__rn") == F.col("__lo"))
               | (F.col("__rn") == F.col("__hi")))
        .groupBy(*keys)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__lo"), v)).alias("__plo"),
            F.min(F.when(F.col("__rn") == F.col("__hi"), v)).alias("__phi"),
        )
    )
    return (
        df.join(bounds, on=keys, how="left")
        .withColumn(
            out_col,
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("__plo")), F.col("__phi")),
            ),
        )
        .drop("__plo", "__phi")
    )


def quantile_picks(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    pcts: tuple[int, ...] = (25, 50, 75, 95),
) -> DataFrame:
    """Grouped multi-quantile summary in ONE window pass: for each key
    and each requested percentile, the exact discrete-percentile PICK
    (the winsorize index rule: the max(ceil(n·q/100), 1)-th smallest
    value). Returns (*key_cols, pct, pick) — picks are raw data
    values, never interpolations, so doubles hash-compare exactly
    cross-engine.

    Shape: one rank window + one count window on a single (key, value)
    sort; each row tests its rank against the per-key index ARRAY (a
    higher-order filter — |pcts| comparisons per row, zero joins) and
    explodes only the matches. k percentiles cost the SAME one
    Exchange as one percentile — the generalization of winsorize's
    two-bound pick and mad_stats' median pick.
    """
    if not pcts or not all(0 <= p <= 100 for p in pcts):
        raise ValueError("pcts must be in [0, 100]")
    keys = list(key_cols)
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(value_col)
    wn = Window.partitionBy(*keys)
    ranked = (
        df.where(v.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wn))
    )
    idxs = F.array(
        *[
            F.struct(
                F.lit(int(p)).alias("pct"),
                F.greatest(
                    ((F.col("__n") * int(p) + 99) / F.lit(100)).cast(
                        "long"
                    ),
                    F.lit(1),
                ).alias("idx"),
            )
            for p in pcts
        ]
    )
    matches = F.filter(idxs, lambda x: x["idx"] == F.col("__rn"))
    return ranked.select(
        *keys, F.explode(matches).alias("__m"), v.alias("pick")
    ).select(*keys, F.col("__m.pct").alias("pct"), "pick")
