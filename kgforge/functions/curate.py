"""Corpus curation: the training-data filtering recipe as ONE composable
operator (engine-new; the reference has no curation surface — SURVEY §2
engine-new family, graded first-class with dedup/ANN/textstats).

`curate_documents` runs the standard web-corpus funnel over a documents
table, in the order a 100 TB pipeline wants it (cheap column predicates
first, the only shuffle-bearing steps last, on the already-shrunk
survivor set):

1. language gate       — integer stopword-hit threshold (textstats.lang_id)
2. quality gate        — integer signal thresholds (textstats.quality_stats)
3. exact dedup         — md5-fingerprint groupBy, keep the smallest id
4. near-dup dedup      — MinHash-LSH verified pairs (dedup.minhash_pairs,
                         bucket-capped) closed into clusters by connected
                         components (canon.connected_components), keep the
                         smallest id per cluster

Every dropped row lands in an audit DataFrame with its FIRST drop reason
(lang > quality > exact_dup > near_dup) — silent shrinkage is how corpora
rot, so the funnel is accountable by construction. Steps 1–3 are plain
column expressions + one hash aggregate (SQL-expressible, oracle-gated in
driver_queries); step 4 reuses the capped LSH machinery and the CC
fixpoint, both already bounded for crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.functions import dedup as D
from kgforge.functions import textstats as TS


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_min_hits: int = 2,
    min_tokens: int = 5,
    max_punct_per_token_pct: int = 100,
    near_dup: bool = True,
    minhash_kwargs: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (kept, audit): kept has the input columns; audit is
    (id, reason) for every dropped row.

    Thresholds are integers (cross-multiplied for the punct ratio) so the
    oracle comparison is bit-exact. `near_dup=False` keeps the whole
    funnel SQL-expressible.
    """
    base = TS.quality_stats(
        TS.lang_id(df, text_col, min_hits=lang_min_hits), text_col
    )
    reason = (
        F.when(F.col("pred_lang") != "en", F.lit("lang"))
        .when(
            (F.col("n_tokens") < min_tokens)
            | (
                F.lit(100) * F.col("n_punct")
                > F.lit(max_punct_per_token_pct)
                * F.greatest(F.col("n_tokens"), F.lit(1))
            ),
            F.lit("quality"),
        )
    )
    flagged = base.withColumn("_reason", reason)
    survivors = flagged.filter(F.col("_reason").isNull()).select(
        *df.columns
    )

    # exact dedup: keep the smallest id per normalized-text fingerprint
    fp = TS.normalize_text(F.col(text_col))
    with_fp = survivors.withColumn(
        "_fp", F.md5(F.encode(fp, "UTF-8"))
    )
    keepers = with_fp.groupBy("_fp").agg(
        F.min(id_col).alias("_keep_id")
    )
    exact_kept = (
        with_fp.join(keepers, on="_fp")
        .withColumn(
            "_reason",
            F.when(F.col(id_col) != F.col("_keep_id"), F.lit("exact_dup")),
        )
    )
    survivors2 = exact_kept.filter(F.col("_reason").isNull()).select(
        *df.columns
    )

    audit = flagged.filter(F.col("_reason").isNotNull()).select(
        F.col(id_col).alias("id"), F.col("_reason").alias("reason")
    ).unionByName(
        exact_kept.filter(F.col("_reason").isNotNull()).select(
            F.col(id_col).alias("id"), F.col("_reason").alias("reason")
        )
    )

    if not near_dup:
        return survivors2, audit

    # near-dup: verified LSH pairs -> CC clusters -> keep min id per cluster
    from kgforge.operators.canon import connected_components

    pairs = D.minhash_pairs(
        survivors2, id_col=id_col, text_col=text_col,
        **(minhash_kwargs or {}),
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    vertices = (
        pairs.select(F.col("src").alias("id"))
        .unionByName(pairs.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    # (id, component); component = min id of the near-dup cluster
    comp = connected_components(vertices, pairs)
    near_drops = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id"), F.lit("near_dup").alias("reason")
    )
    kept = survivors2.join(
        near_drops.select(F.col("id").alias(id_col)),
        on=id_col,
        how="left_anti",
    )
    return kept, audit.unionByName(near_drops)
