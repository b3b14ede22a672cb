"""Corpus curation: the training-data filtering recipe as ONE composable
operator (engine-new; the reference has no curation surface — SURVEY §2
engine-new family, graded first-class with dedup/ANN/textstats).

`curate_documents` runs the standard web-corpus funnel over a documents
table, in the order a 100 TB pipeline wants it (cheap column predicates
first, the only shuffle-bearing steps last, on the already-shrunk
survivor set):

1. language gate       — integer stopword-hit threshold (textstats.lang_id)
2. quality gate        — integer signal thresholds (textstats.quality_stats)
2b. repetition gate    — OPTIONAL Gopher-style dup-line / top-bigram
                         thresholds (textstats.repetition_stats)
3. exact dedup         — md5-fingerprint groupBy, keep the smallest id
4. near-dup dedup      — MinHash-LSH verified pairs (dedup.minhash_pairs,
                         bucket-capped) closed into clusters by connected
                         components (canon.connected_components), keep the
                         smallest id per cluster
5. PII scrub           — OPTIONAL email/IP/phone redaction of the kept
                         text (functions/scrub.scrub_pii; rewrite, not
                         a drop)

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
    max_dup_line_pct: int | None = None,
    max_top_bigram_pct: int | None = None,
    zipf_model: DataFrame | None = None,
    max_mean_rank: tuple[int, int] | None = None,
    scrub: bool = False,
    max_span_dup_pct: int | None = None,
    span_ngram: int = 13,
    bench: DataFrame | None = None,
    bench_ngram: int = 13,
    near_dup: bool = True,
    minhash_kwargs: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (kept, audit): kept has the input columns; audit is
    (id, reason) for every dropped row.

    Thresholds are integers (cross-multiplied for the punct ratio) so the
    oracle comparison is bit-exact. `near_dup=False` keeps the whole
    funnel SQL-expressible.

    Optional stages (off by default, so the SQL-oracle gate pins the
    core funnel): `max_dup_line_pct` / `max_top_bigram_pct` add the
    Gopher-style repetition gate (textstats.repetition_stats) between
    the quality gate and dedup — reason ``repetition`` when the
    duplicate-line fraction or the top-bigram share exceeds the given
    percentage (integer cross-multiplied); `scrub=True` redacts
    email/IP/phone PII from the KEPT text (functions/scrub.scrub_pii) —
    a rewrite, not a drop, so it adds no audit rows.
    `max_span_dup_pct` adds the span-duplication gate
    (dedup.duplicate_spans, Lee et al. coverage): drop reason
    ``duplicated_spans`` when duplicated `span_ngram`-token spans
    cover more than that percentage of the doc's tokens (integer
    cross-multiplied). `bench=<DataFrame(bench_id, text)>` adds
    benchmark DECONTAMINATION
    (dedup.ngram_contamination, exact `bench_ngram`-gram overlap):
    contaminated docs drop with reason ``contaminated`` before dedup.
    `zipf_model` (textstats.zipf_rank_model) + `max_mean_rank=(num,
    den)` add the CCNet-style LM-quality gate: drop reason
    ``perplexity`` when the doc's mean token rank exceeds num/den
    (integer cross-multiplied — den*sum_rank > num*n_tok — so the
    threshold compare stays bit-exact cross-engine).
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

    rep_audit = None
    if max_dup_line_pct is not None or max_top_bigram_pct is not None:
        rep = TS.repetition_stats(survivors, text_col, id_col)
        rep_cond = F.lit(False)
        if max_dup_line_pct is not None:
            rep_cond = rep_cond | (
                F.lit(100) * (F.col("n_lines") - F.col("n_distinct_lines"))
                > F.lit(max_dup_line_pct) * F.col("n_lines")
            )
        if max_top_bigram_pct is not None:
            rep_cond = rep_cond | (
                F.lit(100) * F.col("top_bigram_n")
                > F.lit(max_top_bigram_pct)
                * F.greatest(F.col("n_bigrams"), F.lit(1))
            )
        rep = rep.withColumn(
            "_reason", F.when(rep_cond, F.lit("repetition"))
        )
        rep_audit = rep.filter(F.col("_reason").isNotNull()).select(
            F.col(id_col).alias("id"), F.col("_reason").alias("reason")
        )
        survivors = rep.filter(F.col("_reason").isNull()).select(
            *df.columns
        )

    zipf_audit = None
    if zipf_model is not None and max_mean_rank is not None:
        num, den = max_mean_rank
        if den <= 0 or num < 0:
            raise ValueError("max_mean_rank must be (num >= 0, den > 0)")
        z = TS.zipf_quality(survivors, zipf_model, text_col, id_col)
        z = z.withColumn(
            "_reason",
            F.when(
                F.lit(den) * F.col("sum_rank")
                > F.lit(num) * F.greatest(F.col("n_tok"), F.lit(1)),
                F.lit("perplexity"),
            ),
        )
        zipf_audit = z.filter(F.col("_reason").isNotNull()).select(
            F.col(id_col).alias("id"), F.col("_reason").alias("reason")
        )
        survivors = z.filter(F.col("_reason").isNull()).select(*df.columns)

    span_audit = None
    if max_span_dup_pct is not None:
        spans = D.duplicate_spans(
            survivors, n=span_ngram, id_col=id_col, text_col=text_col
        )
        cover = spans.groupBy(id_col).agg(
            F.sum(
                F.col("span_end") - F.col("span_start") + 1
            ).alias("_covered")
        )
        sized = survivors.withColumn(
            "_n_tok", F.size(F.split(F.col(text_col), " "))
        ).join(cover, on=id_col, how="left")
        span_cond = (
            F.lit(100) * F.coalesce("_covered", F.lit(0))
            > F.lit(max_span_dup_pct) * F.greatest("_n_tok", F.lit(1))
        )
        sized = sized.withColumn(
            "_reason", F.when(span_cond, F.lit("duplicated_spans"))
        )
        span_audit = sized.filter(F.col("_reason").isNotNull()).select(
            F.col(id_col).alias("id"), F.col("_reason").alias("reason")
        )
        survivors = sized.filter(F.col("_reason").isNull()).select(
            *df.columns
        )

    decon_audit = None
    if bench is not None:
        hits = (
            D.ngram_contamination(
                survivors, bench, n=bench_ngram,
                id_col=id_col, text_col=text_col,
            )
            .select(F.col("doc_id").alias(id_col))
            .dropDuplicates()
        )
        decon_audit = hits.select(
            F.col(id_col).alias("id"), F.lit("contaminated").alias("reason")
        )
        survivors = survivors.join(hits, on=id_col, how="left_anti")

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
    if rep_audit is not None:
        audit = audit.unionByName(rep_audit)
    if zipf_audit is not None:
        audit = audit.unionByName(zipf_audit)
    if span_audit is not None:
        audit = audit.unionByName(span_audit)
    if decon_audit is not None:
        audit = audit.unionByName(decon_audit)

    def _finish(kept: DataFrame) -> DataFrame:
        if not scrub:
            return kept
        from kgforge.functions.scrub import scrub_pii

        cleaned = scrub_pii(kept, text_col, out_col="__clean")
        return cleaned.select(
            *[
                F.col("__clean").alias(text_col) if c == text_col
                else F.col(c)
                for c in kept.columns
            ]
        )

    if not near_dup:
        return _finish(survivors2), audit

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
    return _finish(kept), audit.unionByName(near_drops)


def prepare_corpus(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: list[tuple[str, int]] | None = None,
    salt: str = "kgforge",
    weight_col: str | None = None,
    **curate_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """One-call training-corpus prep: curate -> deterministic hash
    split -> token-budget shard assignment. Returns (prepared, audit):
    `prepared` is the kept rows plus ``split`` and ``shard`` columns,
    `audit` names every dropped row (curate_documents contract).

    Shards are assigned WITHIN each split in key order (a shard never
    straddles the train/val boundary — trainers consume splits
    independently), via `sharding.token_shards`' distributed
    prefix-sum, one pass per split label (the per-split total hop to
    the driver is one row per partition — metadata scale). The shard
    weight defaults to ``length(text_col)`` (chars) so it works before
    any tokenizer choice; pass `weight_col` to shard on real token
    counts.
    """
    from kgforge.functions.sharding import hash_split, token_shards

    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    if isinstance(splits, dict):
        splits = list(splits.items())
    kept, audit = curate_documents(
        df, id_col=id_col, text_col=text_col, **curate_kwargs
    )
    kept = hash_split(kept, key_col=id_col, splits=splits, salt=salt)
    wcol = weight_col
    if wcol is None:
        wcol = "__w"
        kept = kept.withColumn(wcol, F.length(F.col(text_col)))
    parts = []
    for name, _w in splits:
        sub = kept.filter(F.col("split") == name)
        parts.append(
            token_shards(sub, budget, key_col=id_col, weight_col=wcol)
        )
    prepared = parts[0]
    for p in parts[1:]:
        prepared = prepared.unionByName(p)
    if weight_col is None:
        prepared = prepared.drop("__w")
    return prepared, audit
