"""K-minimum-values (KMV) distinct-count sketch — deterministic by
construction.

The classic bottom-k theta sketch (Bar-Yossef et al. 2002): hash every
value to a uniform point in [0, 1), keep each group's k SMALLEST hash
points; the k-th point's position estimates the distinct count as
``(k - 1) / kth``. Unlike HyperLogLog (whose register layout is
engine-specific), KMV's state is just "the k smallest md5 prefixes" — a
pure function of the data, bit-identical on any engine that can md5,
which is what makes a cross-engine oracle possible AND makes sketches
from different pipeline runs safely mergeable.

Mergeability (the scale property): union of sketches = sort-merge the
hash arrays and re-cut at k. A trillion-row table sharded over 10k
partitions needs one k-array per (group, partition) flowing up — never
the raw values.

Hash space: leading 12 md5 hex chars (48 bits) — collision probability
for millions of distinct values is ~n²/2⁴⁹, negligible at sketch
accuracy; hex strings compare lexicographically == numerically at fixed
width, so the oracle needs no hex-to-int conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12
_SPACE = 16 ** _HEX_DIGITS


def kmv_hash(value: Column) -> Column:
    """Uniform 12-hex point for a value (NULL -> NULL, excluded)."""
    return F.substring(
        F.md5(F.encode(value.cast("string"), "UTF-8")), 1, _HEX_DIGITS
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """-> (group..., kmv: array<string> sorted ascending, n_kept).

    Per group, the k smallest DISTINCT hash points of ``value_col``
    (NULL values excluded). ``n_kept < k`` means the group had fewer
    than k distinct values — the sketch is then EXACT (estimate ==
    n_kept). Shape: TWO-LEVEL bottom-k (the sketch's own merge algebra
    applied inside the plan): level 1 cuts each (group, input-partition)
    slice to its k smallest — per-task state is bounded by the
    partition, never by the group — then the <= k-per-partition
    survivors re-cut globally. A single collect_set over the whole group
    would materialize every distinct hash of a hot group on one task.
    Because bottom-k of bottom-ks == global bottom-k, the result is
    byte-identical to the one-level form.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if k <= 1:
        raise ValueError("k must be >= 2")
    d = df.where(F.col(value_col).isNotNull()).select(
        *groups, kmv_hash(F.col(value_col)).alias("__h")
    )
    part = (
        d.groupBy(*groups, F.spark_partition_id().alias("__pid"))
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("__s"))
        .select(*groups, F.explode("__s").alias("__h"))
    )
    return (
        part.groupBy(*groups)
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("kmv"))
        .withColumn("n_kept", F.size("kmv").cast("long"))
    )


def kmv_merge(kmv_a: Column, kmv_b: Column, k: int = 256) -> Column:
    """Merged sketch array: union, re-sort, re-cut at k. The algebra of
    the sketch — merge(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    return F.slice(F.array_sort(F.array_union(kmv_a, kmv_b)), 1, k)


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate (long): exact size when the group kept
    fewer than k points, else ``floor((k - 1) * SPACE / kth_point)`` —
    the bottom-k estimator. Deterministic (same sketch -> same number);
    the division runs in double, which is fine for an ESTIMATOR — the
    cross-engine-exact artifacts are the sketch arrays themselves, which
    is what the oracle gate pins."""
    kth = F.element_at(kmv, k)
    # fixed-width hex -> numeric via conv (fits a long: 48 bits)
    kth_num = F.conv(kth, 16, 10).cast("long")
    return F.when(F.size(kmv) < k, F.size(kmv).cast("long")).otherwise(
        F.floor(F.lit(float((k - 1) * _SPACE)) / kth_num).cast("long")
    )


# =====================================================================
# HyperLogLog — register-table formulation
# =====================================================================
#
# HLL (Flajolet et al. 2007) complements KMV: its per-group state is
# 2^p small integers (vs KMV's k hash strings), and merging is a plain
# per-bucket MAX — the cheapest possible sketch algebra for a
# 1000-executor rollup. Engine HLL implementations (Spark's
# approx_count_distinct, DuckDB's approx_*) use private register
# layouts, so they can never be oracle-compared; this one derives every
# register from md5 STRING arithmetic that both engines evaluate
# bit-identically, making the register table itself the cross-engine
# artifact (like kmv's hash arrays):
#
#   h       = md5(value)                      32 hex chars
#   bucket  = first p/4 hex chars as int      (p must be hex-aligned)
#   tail    = next 12 hex chars               48 uniform bits
#   rho     = 1 + #leading zero BITS of tail  in [1, 49]
#           = 4 * (#leading '0' hex chars) + lz(first non-zero digit) + 1
#
# lz(digit) needs only lexicographic compares ('8'..'f' -> 0, '4'..'7'
# -> 1, '2'..'3' -> 2, '1' -> 3), so the whole register derivation is
# substr/regexp/CASE — portable to any SQL engine, no bit intrinsics.

_HLL_TAIL_HEX = 12  # 48 bits of rank material; max rho = 49


def hll_rho(tail: Column) -> Column:
    """1 + number of leading zero bits of a 12-hex-char string (int)."""
    lz = F.length(F.regexp_extract(tail, "^(0*)", 1))
    first = tail.substr(lz + F.lit(1), F.lit(1))
    digit_lz = (
        F.when(first >= "8", F.lit(0))
        .when(first >= "4", F.lit(1))
        .when(first >= "2", F.lit(2))
        .otherwise(F.lit(3))
    )
    return F.when(lz >= _HLL_TAIL_HEX, F.lit(4 * _HLL_TAIL_HEX + 1)).otherwise(
        lz * 4 + digit_lz + 1
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """-> (group..., bucket: long, max_rho: long) — one row per NON-ZERO
    register (absent bucket == register value 0).

    Scale shape: a single groupBy(group, bucket).max — Spark's partial
    aggregation IS the sketch merge (each map task holds at most
    groups x 2^p ints), the md5 bucket is uniform by construction (no
    skew), and downstream unions of register tables merge with the same
    groupBy-max. NULL values are excluded, matching count-distinct.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError("p must be one of 4, 8, 12, 16 (hex-aligned)")
    nb = p // 4
    d = df.where(F.col(value_col).isNotNull()).select(
        *groups,
        F.md5(F.encode(F.col(value_col).cast("string"), "UTF-8")).alias("__h"),
    )
    d = d.select(
        *groups,
        F.conv(F.substring("__h", 1, nb), 16, 10).cast("long").alias("bucket"),
        F.col("__h").substr(F.lit(nb + 1), F.lit(_HLL_TAIL_HEX)).alias("__t"),
    )
    return (
        d.select(*groups, "bucket", hll_rho(F.col("__t")).alias("__rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("__rho").cast("long").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | str, p: int = 8
) -> DataFrame:
    """-> (group..., est: long) — the standard HLL estimator with the
    small-range (linear counting) correction. The float math here is an
    ESTIMATOR (same registers -> same number on one engine); the
    cross-engine-exact artifact is the register table itself."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m = 2**p
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else (0.673 if m == 16 else 0.697 if m == 32 else 0.709)
    agg = registers.groupBy(*groups).agg(
        F.count("*").alias("__nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__inv"),
    )
    # absent buckets contribute 2^0 = 1 each to the harmonic sum
    inv_full = F.col("__inv") + (F.lit(m) - F.col("__nz"))
    raw = F.lit(alpha * m * m) / inv_full
    zeros = F.lit(m) - F.col("__nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*groups, F.round(est).cast("long").alias("est"))


# =====================================================================
# Count-Min sketch — heavy-hitter counters
# =====================================================================
#
# Cormode & Muthukrishnan 2005: d counter rows of width w; every value
# increments one counter per row (bucket = hash_seed_i(value) mod w);
# a point query reads the MIN of its d counters — an overestimate by at
# most eps*N with probability 1-delta (w = ceil(e/eps), d = ceil(ln
# 1/delta)). Unlike Misra-Gries/SpaceSaving (whose state depends on
# arrival ORDER), CM counters are plain SUMS over the multiset — order-
# independent, mergeable by per-cell addition, and bit-identical on any
# engine that can md5, so both the sketch AND its point estimates are
# oracle-checkable integers.

_CM_HEX = 12  # 48 uniform bits per (seed, value) draw


def cm_bucket(value: Column, seed: int, width: int) -> Column:
    """Row-``seed`` counter index of a value: md5('cm<seed>|' || v) mod w.

    48 hex bits -> BIGINT via conv, mod width. Seeded by PREFIXING the
    value (one md5 per row of the sketch) — the same
    independent-draws-by-prefix trick as graph random_walks."""
    h = F.md5(
        F.encode(
            F.concat(F.lit(f"cm{seed}|"), value.cast("string")), "UTF-8"
        )
    )
    return (
        F.conv(F.substring(h, 1, _CM_HEX), 16, 10).cast("long") % width
    )


def cm_sketch(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """-> (group..., row: int, bucket: long, cnt: long) — one record per
    NON-ZERO counter cell (absent cell == 0).

    Scale shape: one pass emits depth (row, bucket) pairs per input row
    via an exploded literal seed array, then a single map-side-combining
    groupBy sums the cells; per-task state is bounded by
    groups x depth x width ints. Merging sketches from different runs =
    unionByName + the same groupBy-sum (counters are sums)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if width < 2 or depth < 1:
        raise ValueError("need width >= 2 and depth >= 1")
    d = df.where(F.col(value_col).isNotNull())
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cm_bucket(F.col(value_col), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("c")
    return (
        d.select(*groups, rows)
        .select(*groups, "c.row", "c.bucket")
        .groupBy(*groups, "row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cm_query(
    sketch: DataFrame,
    items: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query items against a sketch: -> (group..., value, est).

    est = min over the d rows of the addressed counters (missing cell =
    0, though a queried value that was ever inserted always has all d
    cells present). All-integer — the estimate is exactly reproducible
    in SQL, overestimates true frequency by design."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    it = items.where(F.col(value_col).isNotNull()).select(
        *groups, F.col(value_col).alias("value")
    )
    addr = it.select(
        *groups,
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cm_bucket(F.col("value"), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(*groups, "value", "c.row", "c.bucket")
    j = addr.join(sketch, on=groups + ["row", "bucket"], how="left")
    return (
        j.groupBy(*groups, "value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


# =====================================================================
# Bloom filter — set-membership bits
# =====================================================================
#
# Same portability rule as CM: bit addresses come from seed-prefixed
# md5, so the SET-BIT TABLE (group, bit) is a pure function of the key
# set — mergeable by DISTINCT union (bitwise OR) and exactly
# reproducible in SQL. The classic use at scale is a semi-join
# pre-filter: ship a few KB of bits instead of shuffling the big side
# (Spark's own runtime row-group skipping plays the same trick).

def bloom_bit(value: Column, seed: int, m_bits: int) -> Column:
    """Row-``seed`` bit index of a value: md5('bf<seed>|' || v) mod m."""
    h = F.md5(
        F.encode(
            F.concat(F.lit(f"bf{seed}|"), value.cast("string")), "UTF-8"
        )
    )
    return F.conv(F.substring(h, 1, _CM_HEX), 16, 10).cast("long") % m_bits


def bloom_build(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """-> (group..., bit: long) — the DISTINCT set bits per group.

    One exploded-seed pass + dropDuplicates (map-side partial dedup);
    per-task state bounded by groups x m_bits. Merge = unionByName +
    dropDuplicates (set OR)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if m_bits < 2 or k < 1:
        raise ValueError("need m_bits >= 2 and k >= 1")
    d = df.where(F.col(value_col).isNotNull())
    bits = F.explode(
        F.array(
            *[bloom_bit(F.col(value_col), i, m_bits) for i in range(k)]
        )
    ).alias("bit")
    return d.select(*groups, bits).dropDuplicates(groups + ["bit"])


def bloom_probe(
    bits: DataFrame,
    items: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """-> (group..., value, maybe: boolean) — true iff ALL k addressed
    bits are set (no false negatives; false-positive rate set by the
    m/n/k budget). Integer/boolean throughout — oracle-exact."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    it = items.where(F.col(value_col).isNotNull()).select(
        *groups, F.col(value_col).alias("value")
    )
    addr = it.select(
        *groups,
        "value",
        F.explode(
            F.array(
                *[bloom_bit(F.col("value"), i, m_bits) for i in range(k)]
            )
        ).alias("bit"),
    )
    j = addr.join(bits, on=groups + ["bit"], how="left_semi")
    hits = j.groupBy(*groups, "value").agg(F.count("*").alias("__hits"))
    return (
        it.dropDuplicates(groups + ["value"])
        .join(hits, on=groups + ["value"], how="left")
        .select(
            *groups,
            "value",
            (F.coalesce("__hits", F.lit(0)) == k).alias("maybe"),
        )
    )


# =====================================================================
# KMV set operations — theta-sketch intersection / Jaccard
# =====================================================================
#
# The bottom-k union IS a uniform sample of A ∪ B (theta sketches,
# Dasgupta et al.): merge the two k-arrays, re-cut at k, and count how
# many surviving points appear in BOTH inputs. jaccard ≈ inter/|cut|,
# |A ∩ B| ≈ jaccard * est(A ∪ B). The artifacts (cut array, counts) are
# pure data functions — oracle-checkable like the sketches themselves.

def kmv_intersect_count(kmv_a: Column, kmv_b: Column, k: int = 256) -> Column:
    """Number of union-bottom-k points present in BOTH sketches (long).

    The theta-sketch intersection numerator: exact integers, no RNG.
    NOTE the denominator is ``size(kmv_merge(a, b, k))``, not k — sub-k
    unions make the estimate exact."""
    cut = kmv_merge(kmv_a, kmv_b, k)
    both = F.filter(
        cut,
        lambda h: F.array_contains(kmv_a, h) & F.array_contains(kmv_b, h),
    )
    return F.size(both).cast("long")


def kmv_jaccard(kmv_a: Column, kmv_b: Column, k: int = 256) -> Column:
    """Jaccard-similarity estimate (double): intersection fraction of
    the union's bottom-k sample. Estimator — deterministic per engine;
    the cross-engine-exact artifacts are the counts."""
    cut = kmv_merge(kmv_a, kmv_b, k)
    return kmv_intersect_count(kmv_a, kmv_b, k) / F.size(cut)


def kmv_difference_count(
    kmv_a: Column, kmv_b: Column, k: int = 256
) -> Column:
    """Number of union-bottom-k points present in A but NOT in B (long)
    — the theta-sketch a-not-b numerator, completing the set-op family
    (union = kmv_merge, intersection = kmv_intersect_count).

    |A \\ B| ≈ (this / size(kmv_merge(a, b, k))) * est(A ∪ B); the
    estimate is a derived float, the cross-engine-exact artifact is the
    integer count. Sub-k unions make it exact (same cut rule as
    kmv_intersect_count)."""
    cut = kmv_merge(kmv_a, kmv_b, k)
    only_a = F.filter(
        cut,
        lambda h: F.array_contains(kmv_a, h) & ~F.array_contains(kmv_b, h),
    )
    return F.size(only_a).cast("long")


# =====================================================================
# Moments sketch — mergeable power sums (Gan et al., VLDB 2018)
# =====================================================================
#
# The cheapest mergeable distribution summary: per key keep
# (n, Σv, Σv², Σv³, Σv⁴). Merging = adding the tuples (trivially
# associative/commutative → map-side combine, rollup cascades, CRDT
# streams all free); mean/variance/skewness/kurtosis derive exactly,
# quantiles approximately (Cornish-Fisher). Values are scaled to
# integers and the sums run in DECIMAL(38,0), so the sketch STATE is
# cross-engine hash-exact — the same oracle-checkability rule as the
# HLL/KMV/CM families above; only the derived float stats are
# estimates.

def moments_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """-> group_cols + (n, m1, m2, m3, m4): integer power sums of
    round(value*scale). One map-side-combining hash aggregate; v⁴ at
    cent scale overflows BIGINT after ~60 rows, hence DECIMAL(38,0)
    accumulators (DuckDB twin: HUGEINT sums cast to DECIMAL(38,0))."""
    v = F.round(F.col(value_col) * scale).cast("decimal(38,0)")
    d = df.withColumn("__v", v)
    vv = F.col("__v")
    return d.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(vv).cast("decimal(38,0)").alias("m1"),
        F.sum(vv * vv).cast("decimal(38,0)").alias("m2"),
        F.sum(vv * vv * vv).cast("decimal(38,0)").alias("m3"),
        F.sum(vv * vv * vv * vv).cast("decimal(38,0)").alias("m4"),
    )


def moments_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate finer-grained moment partials to coarser keys —
    pure column sums (the whole point of the sketch: a monthly profile
    reads 30 daily partial rows, never the raw events)."""
    return sketch.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("m1").cast("decimal(38,0)").alias("m1"),
        F.sum("m2").cast("decimal(38,0)").alias("m2"),
        F.sum("m3").cast("decimal(38,0)").alias("m3"),
        F.sum("m4").cast("decimal(38,0)").alias("m4"),
    )


def moments_stats(sketch: DataFrame, scale: int = 100) -> DataFrame:
    """Derive (mean, variance, skewness, kurtosis) float columns from
    the exact integer state. Population moments (no Bessel); floats are
    a read-time derivation, never part of the mergeable state."""
    n = F.col("n").cast("double")
    m1 = F.col("m1").cast("double") / scale
    m2 = F.col("m2").cast("double") / (scale * scale)
    m3 = F.col("m3").cast("double") / (scale ** 3)
    m4 = F.col("m4").cast("double") / (scale ** 4)
    mean = m1 / n
    var = m2 / n - mean * mean
    mu3 = m3 / n - 3 * mean * m2 / n + 2 * mean ** 3
    mu4 = (
        m4 / n
        - 4 * mean * m3 / n
        + 6 * mean * mean * m2 / n
        - 3 * mean ** 4
    )
    sd = F.sqrt(var)
    return sketch.select(
        "*",
        mean.alias("mean"),
        var.alias("variance"),
        F.when(var > 0, mu3 / (sd * sd * sd)).alias("skewness"),
        F.when(var > 0, mu4 / (var * var)).alias("kurtosis"),
    )
