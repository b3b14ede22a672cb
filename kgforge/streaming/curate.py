"""Streaming corpus curation for a crawl ingest — the Structured-Streaming
twin of `functions.curate.curate_documents`.

The batch funnel is the audited dedup-at-rest path; this operator gates
pages AS THEY ARRIVE so junk never reaches the landing table. Reference
scope note: the reference SDK has no streaming or curation story at all —
engine-new, like the rest of §2.9.

Scale posture: every gate except dedup is a STATELESS row predicate, so
it runs identically on a stream and a batch frame with zero state store
cost:

- language / quality gates reuse the exact column expressions of the
  batch funnel (`textstats.lang_id` / `quality_stats`);
- the repetition gate needs no cross-row state either — the document IS
  the row — so where the batch path uses explode + two-level aggregate
  (cheaper at rest: no Python), the stream computes the same counters
  per-row in one Arrow-vectorized pandas UDF. A parity test pins the two
  implementations to identical numbers;
- PII scrubbing is a rewrite of kept rows (`functions.scrub.scrub_pii`);
- only the exact-dup guard keeps state: `dedup_stream`'s
  `dropDuplicatesWithinWatermark`, bounded by the re-crawl window.

Dropped rows are filtered, not audited — a stream has no second output;
run the batch funnel over the landing table when you need the audit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StructField, StructType

from kgforge.functions import textstats as TS

# DataType instances, not a DDL string: building the UDF at import time
# must not require an active session (CLAUDE.md gotcha)
_REP_SCHEMA = StructType(
    [
        StructField("n_lines", LongType()),
        StructField("n_distinct_lines", LongType()),
        StructField("n_bigrams", LongType()),
        StructField("top_bigram_n", LongType()),
    ]
)


@pandas_udf(_REP_SCHEMA)
def _repetition_row(texts: pd.Series) -> pd.DataFrame:
    """Per-row twin of `textstats.repetition_stats` (same semantics:
    lines split on \\n, whitespace tokens of the trimmed text, <2 tokens
    -> zero bigrams). Vectorized over the Arrow batch; no cross-row
    state, so it is streaming-safe."""
    import collections

    out = []
    for t in texts:
        if t is None:
            out.append((None, None, 0, 0))
            continue
        lines = t.split("\n")
        toks = t.strip().split()
        if len(toks) < 2:
            out.append((len(lines), len(set(lines)), 0, 0))
            continue
        counts = collections.Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        out.append(
            (
                len(lines),
                len(set(lines)),
                sum(counts.values()),
                max(counts.values()),
            )
        )
    return pd.DataFrame(
        out, columns=[f.name for f in _REP_SCHEMA.fields]
    ).astype("Int64")


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    lang_min_hits: int = 2,
    min_tokens: int = 5,
    max_punct_per_token_pct: int = 100,
    max_dup_line_pct: int | None = None,
    max_top_bigram_pct: int | None = None,
    scrub: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """Kept rows only, gated like the batch funnel: language -> quality
    [-> repetition] [-> watermarked exact dedup] [-> PII scrub]. Same
    integer thresholds and the same strict-> compares as
    `curate_documents`, so a row is kept by the stream iff the batch
    funnel keeps it (dedup excepted: the stream's lookback is the
    watermark horizon, the batch's is unbounded)."""
    t = F.col(text_col)
    gated = TS.quality_stats(
        TS.lang_id(docs, text_col, min_hits=lang_min_hits), text_col
    ).filter(
        (F.col("pred_lang") == "en")
        & (F.col("n_tokens") >= min_tokens)
        & (
            F.lit(100) * F.col("n_punct")
            <= F.lit(max_punct_per_token_pct)
            * F.greatest(F.col("n_tokens"), F.lit(1))
        )
    )
    if max_dup_line_pct is not None or max_top_bigram_pct is not None:
        gated = gated.withColumn("__rep", _repetition_row(t))
        keep = F.lit(True)
        if max_dup_line_pct is not None:
            keep = keep & (
                F.lit(100)
                * (F.col("__rep.n_lines") - F.col("__rep.n_distinct_lines"))
                <= F.lit(max_dup_line_pct) * F.col("__rep.n_lines")
            )
        if max_top_bigram_pct is not None:
            keep = keep & (
                F.lit(100) * F.col("__rep.top_bigram_n")
                <= F.lit(max_top_bigram_pct)
                * F.greatest(F.col("__rep.n_bigrams"), F.lit(1))
            )
        gated = gated.filter(keep).drop("__rep")
    gated = gated.select(*docs.columns)
    if dedup:
        from kgforge.streaming.dedup import dedup_stream

        gated = dedup_stream(
            gated, watermark=watermark, text_col=text_col, ts_col=ts_col
        ).select(*docs.columns)
    if scrub:
        from kgforge.functions.scrub import scrub_pii

        cleaned = scrub_pii(gated, text_col, out_col="__clean")
        gated = cleaned.select(
            *[
                F.col("__clean").alias(text_col) if c == text_col
                else F.col(c)
                for c in docs.columns
            ]
        )
    return gated
