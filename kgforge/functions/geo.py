"""Geohash spatial bucketing — the prefix-joinable location key
(Niemeyer's geohash; the standard pre-S2 spatial blocking scheme).

A spatial join at 100 TB is a BLOCKING problem, exactly like the LSH
text blockers in functions/dedup.py: encode every point to a geohash,
equi-join on a prefix (cell), refine candidates exactly. This module
provides the encoder as PURE integer expressions:

- inputs are integer MICRO-DEGREES (lat_e6, lon_e6) — the repo's
  standing float rule: no float division anywhere, so the driver gate
  hash-compares bit-exactly and the DuckDB oracle can replay the exact
  same arithmetic (the z-order polynomial precedent in sinks/zorder.py);
- quantization is integer floor division of the shifted range —
  identical to the canonical bisection definition;
- bit interleaving (longitude first, MSB first) and base32 rendering
  are shiftright/AND/substr expressions generated per bit — 35 terms at
  precision 7, all WholeStageCodegen.

`geohash_sql` emits the equivalent DuckDB expression so gates replay
the identical bit algebra (the `_HEX12_POLY` technique from
functions/sketch.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_layout(precision: int) -> tuple[int, int, list[tuple[str, int]]]:
    """Total-bit layout: (lon_bits, lat_bits, [(axis, axis_bit_msb0)]
    in interleave order, longitude first)."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    order = []
    li = lo = 0
    for k in range(total):
        if k % 2 == 0:
            order.append(("lon", lon_bits - 1 - lo))
            lo += 1
        else:
            order.append(("lat", lat_bits - 1 - li))
            li += 1
    return lon_bits, lat_bits, order


def geohash_col(
    lat_e6: Column, lon_e6: Column, precision: int = 7
) -> Column:
    """Geohash string from integer micro-degree coordinates.

    Exact-integer quantization: q = ((coord + shift) · 2^bits) div
    range — exact floor division (precision capped at 9 so every
    intermediate stays double-exact; a p=9 cell is ~4.8 m, already
    finer than micro-degree inputs resolve)."""
    if not 1 <= precision <= 9:
        # p=9 cells are ~4.8 m; micro-degree inputs (~0.11 m) cannot
        # honestly resolve finer, and the quantization product
        # rng * 2^bits must stay within double-exact range (< 2^53)
        raise ValueError("precision must be 1..9")
    lon_bits, lat_bits, order = _bit_layout(precision)

    def _quant(shifted: Column, scale: int, rng: int, nbits: int) -> Column:
        # exact floor division on non-negative BIGINTs: (x - x%m) / m
        # keeps everything integer (the standing no-float-division rule);
        # the closed upper edge (+90/+180) clamps into the last cell
        x = shifted.cast("long") * F.lit(scale)
        q = ((x - (x % F.lit(rng))) / F.lit(rng)).cast("long")
        return F.least(q, F.lit(scale - 1))

    latq = _quant(
        lat_e6 + F.lit(90_000_000), 1 << lat_bits, 180_000_000, lat_bits
    )
    lonq = _quant(
        lon_e6 + F.lit(180_000_000), 1 << lon_bits, 360_000_000, lon_bits
    )
    total = 5 * precision
    z = F.lit(0).cast("long")
    for k, (axis, bit) in enumerate(order):
        src = lonq if axis == "lon" else latq
        b = F.shiftright(src, bit).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(b, total - 1 - k)
    chars = [
        F.substring(
            F.lit(_B32),
            (F.shiftright(z, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31))
             + 1).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 7) -> str:
    """DuckDB expression replaying geohash_col's exact bit algebra —
    for driver oracles (the _HEX12_POLY pattern)."""
    lon_bits, lat_bits, order = _bit_layout(precision)
    total = 5 * precision
    latq = (f"least(((({lat_expr})::BIGINT + 90000000)"
            f" * {1 << lat_bits}) // 180000000, {(1 << lat_bits) - 1})")
    lonq = (f"least(((({lon_expr})::BIGINT + 180000000)"
            f" * {1 << lon_bits}) // 360000000, {(1 << lon_bits) - 1})")
    terms = []
    for k, (axis, bit) in enumerate(order):
        src = lonq if axis == "lon" else latq
        # full parens: DuckDB's << binds LOOSER than +, so an unwrapped
        # term would swallow the following summand into its shift count
        terms.append(f"(((({src}) >> {bit}) & 1) << {total - 1 - k})")
    z = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_B32}', (({z} >> {5 * (precision - 1 - i)}) & 31)"
        f"::INT + 1, 1)"
        for i in range(precision)
    ]
    return " || ".join(chars)


def geohash_reference(lat: float, lon: float, precision: int = 7) -> str:
    """Pure-Python bisection reference (the textbook definition) —
    used by tests to certify the integer-quantization encoder."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, out = 0, 0, []
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_rng[0] = mid
            else:
                ch <<= 1
                lon_rng[1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_rng[0] = mid
            else:
                ch <<= 1
                lat_rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _cell_cols(
    lat_e6: Column, lon_e6: Column, precision: int
) -> tuple[Column, Column, int, int]:
    """Quantized (latq, lonq) cell coordinates — the integer core of
    geohash_col, exposed for neighbor arithmetic."""
    lon_bits, lat_bits, _ = _bit_layout(precision)

    def q(shifted: Column, scale: int, rng: int) -> Column:
        x = shifted.cast("long") * F.lit(scale)
        v = ((x - (x % F.lit(rng))) / F.lit(rng)).cast("long")
        return F.least(v, F.lit(scale - 1))

    return (
        q(lat_e6 + F.lit(90_000_000), 1 << lat_bits, 180_000_000),
        q(lon_e6 + F.lit(180_000_000), 1 << lon_bits, 360_000_000),
        lat_bits,
        lon_bits,
    )


def neighbor_pairs(
    df,  # DataFrame
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_e6: int,
    precision: int = 4,
):
    """Distance self-join via geohash-cell blocking: all pairs
    (id_a < id_b) whose PLANAR micro-degree distance satisfies
    dlat² + dlon² <= radius², found by exploding each point into its
    cell plus the 8 neighbors and equi-joining on the cell key — the
    spatial analogue of the LSH band join, never the all-pairs cross
    product. Returns (id_a, id_b, dist2) with dist2 = the exact BIGINT
    squared distance.

    Honest subset: distance is planar in degree space (no haversine —
    floats stay out; fine for blocking-scale radii), and there is no
    antimeridian wrap (neither does planar distance). The cell size at
    ``precision`` must be >= radius so the 3x3 neighborhood is a
    complete candidate cover — checked, raises otherwise.
    """
    lon_bits, lat_bits, _ = _bit_layout(precision)
    cell_lat = 180_000_000 // (1 << lat_bits)
    cell_lon = 360_000_000 // (1 << lon_bits)
    if min(cell_lat, cell_lon) < int(radius_e6):
        raise ValueError(
            f"cell ({cell_lat}x{cell_lon} e6-deg) smaller than radius "
            f"{radius_e6}: 3x3 neighborhood would miss pairs — lower "
            "the precision"
        )
    latq, lonq, lat_bits, lon_bits = _cell_cols(
        F.col(lat_col), F.col(lon_col), precision
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
        latq.alias("__cy"),
        lonq.alias("__cx"),
    )
    d = F.explode(
        F.array(*[F.lit(v) for v in (-1, 0, 1)])
    )
    probe = (
        base.select("*", d.alias("__dy"))
        .select("*", F.explode(
            F.array(*[F.lit(v) for v in (-1, 0, 1)])
        ).alias("__dx"))
        .select(
            F.col("__id").alias("__ida"),
            F.col("__lat").alias("__lata"),
            F.col("__lon").alias("__lona"),
            (F.col("__cy") + F.col("__dy")).alias("__cy"),
            (F.col("__cx") + F.col("__dx")).alias("__cx"),
        )
        .where(
            (F.col("__cy") >= 0)
            & (F.col("__cy") < (1 << lat_bits))
            & (F.col("__cx") >= 0)
            & (F.col("__cx") < (1 << lon_bits))
        )
    )
    joined = probe.join(base, on=["__cy", "__cx"]).where(
        F.col("__ida") < F.col("__id")
    )
    dist2 = (
        (F.col("__lata") - F.col("__lat"))
        * (F.col("__lata") - F.col("__lat"))
        + (F.col("__lona") - F.col("__lon"))
        * (F.col("__lona") - F.col("__lon"))
    )
    r2 = int(radius_e6) * int(radius_e6)
    return joined.where(dist2 <= F.lit(r2)).select(
        F.col("__ida").alias("id_a"),
        F.col("__id").alias("id_b"),
        dist2.cast("long").alias("dist2"),
    )
