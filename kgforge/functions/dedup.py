"""Corpus deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Design for 100 TB (SURVEY §4 hygiene applies):

- **exact**: md5 over normalized text -> hash groupBy. One shuffle keyed by
  the fingerprint; map-side partial agg collapses most duplicates before the
  exchange.
- **n-gram Jaccard**: exact word-set Jaccard, but only *within a blocking
  key* (equi-join realization) — never a cross product. The caller picks the
  block (here: a cheap prefix/source key; at scale: LSH bands below).
- **MinHash-LSH**: signatures computed with *pure built-in expressions*
  (sequence/transform/crc32/array_min) so the whole signature stays inside
  WholeStageCodegen — zero Python. Bands -> posexplode -> self equi-join on
  (band_idx, band_hash): shuffle is keyed by band hash, cross product never
  materializes, AQE splits skewed bands.
- **SimHash**: 64-bit signature via a vectorized numpy pandas UDF (bit-count
  loops don't express well as SQL); near-dup pairs join on rotated 16-bit
  chunks (the standard "split the fingerprint" trick: any pair at Hamming
  distance <= 3 shares at least one of 4 exact chunks).

The reference has no dedup surface (it relies on MERGE idempotence per
extracted key, /root/reference/graphrag_sdk/steps/extract_data_step.py:222);
these operators are engine-new, required for web-scale corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from kgforge.functions.textstats import normalize_text, tokens_col

# persisted intermediates (signature/word-set bases consumed by multiple
# joins) are tracked session-wide; call kgforge.cache.release_cached()
# after materializing results (re-exported here for convenience).
from kgforge.cache import persist_tracked as _persist  # noqa: E402
from kgforge.cache import release_cached  # noqa: F401,E402


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket: int | None):
    """Drop blocking buckets larger than max_bucket before a self-join.

    A huge bucket means the key is non-discriminative (boilerplate-heavy
    crawls put millions of near-identical pages in one band/chunk), and
    joining it is O(bucket^2) in a single join key — the worst-case skew
    cell AQE cannot split. Oversized buckets are dominated by exact or
    trivial duplicates, which `exact_duplicates` already collapses in one
    linear shuffle, so route those through exact dedup first and cap here.
    Same guard as link._pairs_on (operators/link.py).
    """
    if max_bucket is None:
        return df
    from pyspark.sql import Window

    # window count over the bucket keys: ONE exchange (vs groupBy + semi
    # join back = three), and the downstream self-join on the same keys
    # reuses the exchange output partitioning
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )


# ------------------------------------------------------------------ exact


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rows whose normalized text collides -> (id, canon_id, fp).

    canon_id = min id in the collision group (deterministic representative).
    Only true duplicates are returned (groups of size >= 2), canonical row
    included so the caller can either drop or keep-first.
    """
    fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    with_fp = df.select(F.col(id_col).alias("id"), fp.alias("fp"))
    groups = with_fp.groupBy("fp").agg(
        F.min("id").alias("canon_id"), F.count("*").alias("n")
    )
    return (
        with_fp.join(groups.filter(F.col("n") >= 2), on="fp")
        .select("id", "canon_id", "fp")
    )


def dedup_against(
    new: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: drop `new` rows already in a prior
    snapshot, then keep-first within the batch.

    The ingest-time shape of exact dedup — a fresh crawl arrives and
    must be deduplicated against everything already accepted WITHOUT
    re-deduplicating the (much larger) accepted corpus. Two stages, both
    keyed on md5(normalized text):

    1. cross-snapshot: left_anti join of `new` fingerprints against the
       DISTINCT fingerprints of `seen` (the snapshot side reduces to its
       fingerprint set — at scale this is the pre-aggregated/bloom side,
       never the raw corpus);
    2. within-batch: keep the min-id row per surviving fingerprint
       (same canon rule as `exact_duplicates`).

    Returns the surviving `new` rows (all columns). NULL text
    fingerprints as the empty string (NULL would silently VANISH from
    the non-null-safe joins below — neither kept nor deduped), so NULL
    and empty docs share one group; callers filter empties upstream
    (curate_documents does).
    """
    fp = F.md5(
        F.encode(normalize_text(F.coalesce(F.col(text_col), F.lit(""))),
                 "UTF-8")
    )
    new_fp = new.withColumn("__fp", fp)
    seen_fp = seen.select(fp.alias("__fp")).distinct()
    # persisted: the keep-first self-join consumes `fresh` on both sides
    # (CLAUDE.md rule) — without it the normalize+md5 scan AND the
    # snapshot anti-join run twice
    fresh = _persist(new_fp.join(seen_fp, on="__fp", how="left_anti"))
    keep = fresh.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fresh.join(keep, on=["__fp", id_col], how="left_semi").drop("__fp")


# ------------------------------------------------------- n-gram Jaccard


def word_set(text: Column) -> Column:
    return F.array_distinct(tokens_col(F.lower(text)))


def jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = 8,
    den: int = 10,
) -> DataFrame:
    """Exact word-set Jaccard >= num/den within a blocking key.

    Returns (id_a, id_b, inter, uni) with id_a < id_b. The threshold test is
    integer-only (`den*inter >= num*uni`) so engine and oracle agree
    bit-for-bit. Shuffle is keyed on the block column; within-block pairing
    is an equi-join, so cost is sum of squares of block sizes, not N^2.
    """
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        word_set(F.col(text_col)).alias("ws"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b, on=[F.col("a.blk") == F.col("b.blk"), F.col("a.id") < F.col("b.id")]
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.size(F.array_intersect("a.ws", "b.ws")).alias("inter"),
        F.size(F.array_union("a.ws", "b.ws")).alias("uni"),
    )
    return pairs.filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))


# ------------------------------------------------------------ MinHash-LSH

_P = (1 << 31) - 1  # Mersenne prime, fits comfortably in long arithmetic
_DOC_SEED = 777


def _hash_params(n_hashes: int) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(_DOC_SEED)
    a = rng.randint(1, _P, size=n_hashes).tolist()
    b = rng.randint(0, _P, size=n_hashes).tolist()
    return a, b


def shingle_hashes(text: Column, shingle_k: int = 5) -> Column:
    """Distinct crc32 values of the word-k-shingles of `text` (built-ins)."""
    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    idx = F.sequence(
        F.lit(1), F.greatest(n - F.lit(shingle_k - 1), F.lit(1))
    )
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.crc32(
                F.encode(
                    F.concat_ws(" ", F.slice(toks, i, shingle_k)), "UTF-8"
                )
            ),
        )
    )


def minhash_signature(
    text: Column, n_hashes: int = 32, shingle_k: int = 5
) -> Column:
    """MinHash over word-k-shingles — pure built-in expressions (no Python).

    Shaped so the (expensive) shingle array is evaluated ONCE per row: one
    transform maps each shingle to its n_hashes permuted values, then a fold
    takes the element-wise min (`aggregate` + `zip_with(least)`). The naive
    form — n_hashes separate `array_min(transform(shingles, ...))` columns —
    re-evaluates the shingle construction per hash function (no common
    subexpression elimination across higher-order functions) and is ~30x
    slower.
    """
    av, bv = _hash_params(n_hashes)

    def perms(x: Column) -> Column:
        # reduce x mod P first: keeps a*x within int64 range
        xm = x % F.lit(_P)
        return F.array(
            *[(xm * F.lit(a) + F.lit(b)) % F.lit(_P) for a, b in zip(av, bv)]
        )

    per_shingle = F.transform(shingle_hashes(text, shingle_k), perms)
    init = F.array_repeat(F.lit(_P).cast("long"), n_hashes)
    return F.aggregate(
        per_shingle,
        init,
        lambda acc, h: F.zip_with(acc, h, lambda p, q: F.least(p, q)),
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 16,
    shingle_k: int = 5,
    threshold_num: int = 7,
    threshold_den: int = 10,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by exact Jaccard.

    (id_a, id_b, inter, uni) with id_a < id_b, exact word-set Jaccard >=
    threshold. LSH only *blocks* (may lose pairs below ~the band threshold,
    never fabricates); exact verification of the candidates decides.
    Buckets above `max_bucket` are dropped (see _cap_buckets): run
    `exact_duplicates` first so oversized buckets only hold what exact
    dedup already collapsed.
    """
    # _band_table persists its base: the band self-join and the two
    # verification joins would otherwise re-evaluate the signature/
    # shingle expressions per consumer. Bands carry only (id, band key):
    # the word-set arrays must not ride through the n_bands-way
    # explosion and both join sides — verification fetches them back by
    # id from the persisted base.
    bands, ws = _band_table(df, id_col, text_col, n_hashes, n_bands,
                            shingle_k)
    bands = _cap_buckets(bands, ["band_idx", "band_hash"], max_bucket)
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = (
        cands.join(
            ws.select(F.col("id").alias("id_a"), F.col("ws").alias("ws_a")),
            on="id_a",
        )
        .join(
            ws.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b")),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ws_a", "ws_b")).alias("inter"),
            F.size(F.array_union("ws_a", "ws_b")).alias("uni"),
        )
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("uni")
        )
    )
    return verified


class MinHashIndex:
    """A built MinHash-LSH snapshot index: the accepted corpus's band
    table + word sets, persisted once and joined against every incoming
    batch — the NEAR-DUP twin of `dedup_against`'s fingerprint set. At
    scale the snapshot is orders of magnitude larger than a batch, so
    re-banding it per batch (what `minhash_pairs` over the union would
    do) is the thing this index exists to avoid.

    `params` ride with the index: a query batch MUST band with the same
    (n_hashes, n_bands, shingle_k) or bucket keys are meaningless.
    """

    def __init__(self, bands: DataFrame, word_sets: DataFrame,
                 params: dict):
        self.bands = bands          # (id, band_idx, band_hash)
        self.word_sets = word_sets  # (id, ws)
        self.params = params

    def save(self, path: str) -> None:
        """Bands partitioned by band_idx (a probe prunes to its own
        band's files); params as JSON next to them."""
        import json

        self.bands.write.mode("overwrite").partitionBy("band_idx").parquet(
            f"{path}/bands"
        )
        self.word_sets.write.mode("overwrite").parquet(f"{path}/word_sets")
        from kgforge.functions.similarity import _save_json_meta

        _save_json_meta(self.bands, f"{path}/meta", json.dumps(self.params))

    @classmethod
    def load(cls, spark, path: str) -> "MinHashIndex":
        import json

        params = json.loads(
            "".join(r.value for r in spark.read.text(f"{path}/meta").collect())
        )
        return cls(
            spark.read.parquet(f"{path}/bands"),
            spark.read.parquet(f"{path}/word_sets"),
            params,
        )


def _band_table(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int,
    n_bands: int, shingle_k: int,
) -> tuple[DataFrame, DataFrame]:
    """((id, band_idx, band_hash), (id, ws)) — one signature pass."""
    rows_per_band = n_hashes // n_bands
    base = _persist(
        df.select(
            F.col(id_col).alias("id"),
            minhash_signature(F.col(text_col), n_hashes, shingle_k).alias(
                "sig"
            ),
            word_set(F.col(text_col)).alias("ws"),
        )
    )
    bands = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.slice("sig", i * rows_per_band + 1, rows_per_band),
            )
        ).alias("band_idx", "band"),
    ).withColumn("band_hash", F.xxhash64(F.col("band").cast("string"))).drop(
        "band"
    )
    return bands, base.select("id", "ws")


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int | None = 10_000,
) -> MinHashIndex:
    """Build the snapshot index (band once, query many). Oversized
    buckets are capped at BUILD (same `_cap_buckets` rule as
    minhash_pairs) so a degenerate shingle can never quadratic-join a
    later batch."""
    bands, ws = _band_table(df, id_col, text_col, n_hashes, n_bands,
                            shingle_k)
    bands = _cap_buckets(bands, ["band_idx", "band_hash"], max_bucket)
    return MinHashIndex(
        bands, ws,
        {"n_hashes": n_hashes, "n_bands": n_bands, "shingle_k": shingle_k},
    )


def minhash_against(
    new: DataFrame,
    index: MinHashIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 7,
    threshold_den: int = 10,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup candidates of a new batch AGAINST a snapshot index:
    (new_id, seen_id, inter, uni), exact word-set Jaccard >= threshold.

    The incremental form of `minhash_pairs`: the snapshot side is the
    pre-banded index (never re-scanned, never re-shingled); only the new
    batch pays the signature pass. Band equi-join on (band_idx,
    band_hash) blocks; exact Jaccard over both sides' word sets decides
    (LSH can only LOSE candidates, never fabricate) — identical
    verification rule to the in-batch path."""
    p = index.params
    bands, ws = _band_table(
        new, id_col, text_col, p["n_hashes"], p["n_bands"], p["shingle_k"]
    )
    bands = _cap_buckets(bands, ["band_idx", "band_hash"], max_bucket)
    cands = (
        bands.alias("q")
        .join(
            index.bands.alias("s"),
            on=[
                F.col("q.band_idx") == F.col("s.band_idx"),
                F.col("q.band_hash") == F.col("s.band_hash"),
            ],
        )
        .select(
            F.col("q.id").alias("new_id"), F.col("s.id").alias("seen_id")
        )
        .dropDuplicates(["new_id", "seen_id"])
    )
    return (
        cands.join(
            ws.select(F.col("id").alias("new_id"), F.col("ws").alias("ws_n")),
            on="new_id",
        )
        .join(
            index.word_sets.select(
                F.col("id").alias("seen_id"), F.col("ws").alias("ws_s")
            ),
            on="seen_id",
        )
        .select(
            "new_id",
            "seen_id",
            F.size(F.array_intersect("ws_n", "ws_s")).alias("inter"),
            F.size(F.array_union("ws_n", "ws_s")).alias("uni"),
        )
        .filter(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("uni")
        )
    )


# --------------------------------------------------------------- SimHash

_SIMHASH_BITS = 64


@pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (vectorized numpy, Arrow batch).

    Per text: token -> stable 64-bit hash (blake2b digest, seed-free);
    signature bit i = sign of sum over tokens of (2*bit_i - 1).
    """
    import hashlib

    def tok_hash(tok: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
        )

    out = np.empty(len(texts), dtype=np.int64)
    for j, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            out[j] = 0
            continue
        hs = np.fromiter(
            (tok_hash(t_) for t_ in toks), dtype=np.uint64, count=len(toks)
        )
        bits = (
            (hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(i)
        out[j] = np.int64(sig)
    return pd.Series(out)


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Blocking: split the 64-bit signature into 4 16-bit chunks; any pair
    within distance 3 matches exactly on >= 1 chunk (pigeonhole), so the
    self-join is an equi-join on (chunk_idx, chunk_value) — no cross product.
    Distance is then verified exactly with bit_count(xor). Chunk buckets
    above `max_bucket` are dropped (_cap_buckets): 16-bit chunks only have
    65k values, so at billions of docs the blocking demands the cap plus an
    exact-dedup pre-pass.
    """
    sigs = df.select(
        F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("sig")
    )
    chunks = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    chunks = _cap_buckets(chunks, ["chunk_idx", "chunk"], max_bucket)
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cands.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def _word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """Distinct lowercase word n-grams: (out_id, shingle). The token
    array is materialized once before the shingle transform (HOF
    subexpressions are not CSE'd); docs with < n tokens contribute
    nothing."""
    toks = tokens_col(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias(out_id), toks.alias("__t"))
    sh = base.filter(F.size("__t") >= n).select(
        out_id,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__t) - {n} + 1),"
                f" i -> array_join(slice(__t, i, {n}), ' '))"
            )
        ).alias("shingle"),
    )
    return sh.dropDuplicates()


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 13-gram filter, Brown et
    al. 2020 §C): (doc_id, bench_id, n_shared) for every training doc
    sharing at least one exact lowercase word n-gram with a benchmark
    text — the docs a training pipeline must drop (or flag) before the
    eval numbers mean anything.

    Plan shape: both corpora shingle scan-side (distinct word n-grams
    per doc), then ONE equi-join keyed by the shingle string and a
    count aggregate keyed (doc, bench). The benchmark side is tiny in
    practice (eval sets are KBs, the corpus is TBs) — Catalyst
    broadcasts it, so the corpus is never shuffled; with a big bench
    side the shingle-keyed sort-merge join still never materializes a
    cross product.
    """
    a = _word_shingles(docs, id_col, text_col, n, "doc_id")
    b = _word_shingles(bench, bench_id_col, bench_text_col, n, "bench_id")
    return (
        a.join(b, on="shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


# ----------------------------------------------------- paragraph dedup


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
    max_iter: int = 15,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into components and pick one
    representative per cluster — the FineWeb-style "keep the best doc
    of each duplicate cluster" move, composing any pair generator here
    (minhash_pairs / simhash_pairs / jaccard_pairs, or an exact-dup
    edge list) with the hash-to-min connected components from
    operators/canon.py.

    ``pairs`` needs columns (id_a, id_b). Returns ``df`` plus:

    - ``cluster``: the min member id of the row's near-dup component
      (rows in no pair are their own singleton cluster);
    - ``is_rep``: 1 for the cluster's representative — its max-
      ``quality_col`` member (ties and quality_col=None: min id) —
      else 0. Filter ``is_rep = 1`` to materialize the deduped corpus.

    Scale shape: the CC loop runs on the PAIR GRAPH ONLY (docs in at
    least one pair); untouched docs never enter the iteration and join
    back with one broadcast-or-shuffle left join. Representative
    choice is one window keyed by cluster — near-dup clusters are
    small by construction (pair generators cap their buckets), so no
    hot-partition risk.
    """
    from kgforge.operators.canon import connected_components

    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    comp = connected_components(verts, edges, max_iter=max_iter).select(
        F.col("id").alias(id_col), F.col("component").alias("cluster")
    )
    out = df.join(comp, on=id_col, how="left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col(id_col))
    )
    from pyspark.sql import Window

    order = [F.asc(id_col)]
    if quality_col is not None:
        order.insert(0, F.desc(quality_col))
    w = Window.partitionBy("cluster").orderBy(*order)
    return out.withColumn(
        "is_rep",
        (F.row_number().over(w) == 1).cast("long"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup, keep-first (C4/RefinedWeb's
    boilerplate stage: the reference has no curation surface at all —
    engine-new, like the rest of this module).

    Every paragraph (text split on `sep`, empties dropped) survives only
    at its FIRST corpus position — the lexicographic (id, position)
    minimum — and each document is reassembled from its surviving
    paragraphs in original order. A document whose every paragraph is a
    repeat disappears from the output.

    100-TB shape: paragraphs carry an md5 fingerprint; first occurrence
    per fingerprint is groupBy(min(struct(id, pos))) — ONE shuffle keyed
    by the fingerprint with map-side partial agg, so a boilerplate
    paragraph repeated across millions of pages collapses to one row
    per map task before the exchange (a row_number window would send
    the whole hot fingerprint to one partition). The keep decision
    joins back on the fingerprint (AQE handles skewed fingerprints),
    reassembly is one groupBy(id). The exploded paragraph frame feeds
    both sides, so it is persist_tracked.
    """
    import re as _re

    paras = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(
                F.split(F.col(text_col), _re.escape(sep))
            ).alias("__pos", "__para"),
        )
        .filter(F.col("__para") != "")
        .withColumn("__fp", F.md5(F.encode(F.col("__para"), "UTF-8")))
    )
    paras = _persist(paras)
    firsts = paras.groupBy("__fp").agg(
        F.min(F.struct("__id", "__pos")).alias("__first")
    )
    kept = paras.join(firsts, on="__fp").filter(
        (F.col("__id") == F.col("__first").getField("__id"))
        & (F.col("__pos") == F.col("__first").getField("__pos"))
    )
    return (
        kept.groupBy("__id")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__para"))
                    ),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias(text_col),
        )
        .withColumnRenamed("__id", id_col)
        .select(id_col, "n_kept", text_col)
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 13,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated token SPANS per document: (id, span_start,
    span_end, n_shingles) — token positions, end inclusive.

    The span-level exact-substring dedup signal from Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    discretized to n-token shingle granularity so it stays a pure
    relational plan (the paper's suffix array is a single-machine
    structure): a position is duplicated when its n-gram's fingerprint
    occurs >= min_count times CORPUS-WIDE (including within the same
    document — self-repetition is exactly what the signal should
    catch), and runs of duplicated positions closer than n tokens merge
    into one maximal span (their windows overlap or touch). Feed the
    spans to a clipper or use span coverage as a curation feature.

    Plan: one scan builds the token array, fingerprints every position
    with an expression-only transform (md5 of the joined window —
    md5 so a cross-engine oracle can replay fingerprints bit-exactly),
    ONE corpus-wide fingerprint count (map-side partial agg; the
    equivalent of the paper's suffix-array dup lookup), a semi-join
    back, and a gaps-and-islands window per document. Shuffles key on
    fingerprint then doc id — no all-pairs anything; skew on a viral
    fingerprint is bounded by the count aggregate (the semi-join
    carries only (fp, dup?) one row per fp).
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    base = (
        docs.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
    )
    fps = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - n),
        lambda i: F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, n))),
    )
    sh = base.select(
        "__id", F.posexplode(fps).alias("pos", "fp")
    )
    dup_fps = (
        sh.groupBy("fp")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("fp")
    )
    hits = sh.join(dup_fps, on="fp", how="left_semi")
    w = Window.partitionBy("__id").orderBy("pos")
    run = Window.partitionBy("__id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = (
        hits.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") - F.col("__prev") > n),
                1,
            ).otherwise(0),
        )
        .withColumn("__island", F.sum("__new").over(run))
    )
    return (
        isl.groupBy("__id", "__island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n - 1).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_shingles"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start", "span_end", "n_shingles",
        )
    )


def keep_best(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Cluster-representative selection: within each exact-duplicate
    cluster keep the member with the HIGHEST ``quality_col`` (ties to
    the smallest id — deterministic), and emit every OTHER member as a
    drop decision: (id, kept_id, fp). Non-duplicated rows are not
    returned (nothing to decide).

    The Lee et al. "keep the best copy" refinement of keep-first exact
    dedup (`exact_duplicates` keeps min-id regardless of quality):
    when near-identical pages differ in truncation or boilerplate, the
    quality signal — length, curation score — should pick the
    survivor, not arrival order.

    Shape: one fingerprint groupBy + a max_by aggregate (map-side
    combining; the (quality, -id) argmax rides a single struct ordering
    — no window, no second shuffle) + one equi-join back on fp.
    """
    fp = F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    with_fp = df.select(
        F.col(id_col).alias("id"),
        fp.alias("fp"),
        F.col(quality_col).cast("long").alias("__q"),
    )
    # argmax by (quality asc, id desc) struct ordering: max struct =
    # highest quality, then SMALLEST id (negated) — deterministic
    best = with_fp.groupBy("fp").agg(
        F.max(
            F.struct(F.col("__q"), (-F.col("id")).alias("__nid"))
        ).alias("__b"),
        F.count("*").alias("__n"),
    )
    best = best.where(F.col("__n") >= 2).select(
        "fp", (-F.col("__b.__nid")).cast("long").alias("kept_id")
    )
    return (
        with_fp.join(best, on="fp")
        .where(F.col("id") != F.col("kept_id"))
        .select("id", "kept_id", "fp")
    )
