"""Multinomial Naive Bayes text classifier — distributed training.

The fastText-before-fastText baseline every corpus pipeline carries: a
count-based classifier for language ID / quality tiers / domain routing,
trained over the full corpus in one pass. NB's sufficient statistics ARE
plain aggregates — per-class token counts and class totals — so training
is a map-side-combining groupBy (no SGD, no driver round-trips) and the
model is exact integers that a SQL oracle can re-derive. Scoring is one
broadcast-join of the (w -> per-class count map) table plus built-in
log/sum expressions — no Python on the data plane.

Smoothed per-class log-likelihood of a document with tokens w_1..w_n:

    log P(c | d) ∝ log(N_c / N)                       (prior)
                 + Σ_i log(cnt(w_i, c) + α)            (per-token)
                 - n · log(tot_c + α·V)                (normalizer)

with V = vocabulary size over ALL classes (OOV tokens contribute the
α-only term). Ties in the argmax break toward the lexicographically
first class name — deterministic on any engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.functions.textstats import _WS


def _toks(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), _WS)


@dataclass
class NBModel:
    """token_df: (w, cnts: map<cls,long>); classes sorted; totals per class."""

    token_df: DataFrame  # (w, cnts)
    classes: list[str]
    n_docs: dict[str, int]  # class -> document count
    n_tokens: dict[str, int]  # class -> token count
    vocab_size: int


def nb_train(
    df: DataFrame, label_col: str, text_col: str = "text"
) -> NBModel:
    """Train from labeled rows. One exploded-token aggregate builds the
    (w, cls, cnt) statistics; a pivot-to-map keeps the broadcastable
    model at one row per vocabulary word. Class metadata (a handful of
    rows) is collected driver-side; the token table stays distributed.
    """
    d = df.where(
        F.col(text_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(label_col).alias("cls"), _toks(text_col).alias("__t"))
    wc = (
        d.select("cls", F.explode("__t").alias("w"))
        .groupBy("cls", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    token_df = wc.groupBy("w").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("cls", "cnt")))
        ).alias("cnts")
    )
    cls_rows = (
        d.groupBy("cls")
        .agg(
            F.count("*").cast("long").alias("nd"),
            F.sum(F.size("__t")).cast("long").alias("nt"),
        )
        .collect()
    )
    vocab = token_df.count()
    return NBModel(
        token_df=token_df,
        classes=sorted(r.cls for r in cls_rows),
        n_docs={r.cls: r.nd for r in cls_rows},
        n_tokens={r.cls: r.nt for r in cls_rows},
        vocab_size=int(vocab),
    )


def nb_predict(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """-> (id, pred, logp_<cls>... ) — argmax class per document.

    Exploded tokens broadcast-join the model's word map (AQE upgrades
    to shuffle join when the vocabulary outgrows the broadcast bound);
    per-class log terms sum in one aggregate. Documents with zero
    in-vocabulary tokens still score via priors + normalizer.
    """
    import math

    if not model.classes:
        raise ValueError("model has no classes")
    n_total = sum(model.n_docs.values())
    d = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), _toks(text_col).alias("__t")
    )
    toks = d.select("id", F.size("__t").alias("__n"), F.explode("__t").alias("w"))
    j = toks.join(F.broadcast(model.token_df), on="w", how="left")
    per_tok = [
        F.log(
            F.coalesce(F.col("cnts").getItem(c), F.lit(0)).cast("double")
            + F.lit(float(alpha))
        ).alias(f"__lp_{i}")
        for i, c in enumerate(model.classes)
    ]
    scored = j.select("id", "__n", *per_tok).groupBy("id", "__n").agg(
        *[
            F.sum(f"__lp_{i}").alias(f"__s_{i}")
            for i in range(len(model.classes))
        ]
    )
    logps = []
    for i, c in enumerate(model.classes):
        prior = math.log(model.n_docs[c] / n_total)
        norm = math.log(model.n_tokens[c] + alpha * model.vocab_size)
        logps.append(
            (
                F.lit(prior)
                + F.coalesce(F.col(f"__s_{i}"), F.lit(0.0))
                - F.col("__n").cast("double") * F.lit(norm)
            ).alias(f"logp_{c}")
        )
    out = scored.select("id", *logps)
    best = F.greatest(*[F.col(f"logp_{c}") for c in model.classes]) if len(
        model.classes
    ) > 1 else F.col(f"logp_{model.classes[0]}")
    pred = F.lit(None).cast("string")
    # first class (sorted order) wins ties: scan in order, keep first hit
    for c in model.classes:
        pred = F.when(
            pred.isNull() & (F.col(f"logp_{c}") == best), F.lit(c)
        ).otherwise(pred)
    return out.withColumn("pred", pred)
