"""Streaming exact dedup for a crawl ingest (re-crawl / mirror guard).

The batch job (`functions.dedup.exact_duplicates`) is the unbounded-
lookback dedup-at-rest; this operator is its Structured-Streaming twin
for the INGEST path: drop pages whose normalized content fingerprint was
already seen within the watermark horizon, so re-crawls and mirrors never
enter the pipeline. Reference scope note: the reference SDK ingests one
source list per process_sources call and has no streaming or dedup story
at all (/root/reference/graphrag_sdk/kg.py) — engine-new, like the rest
of §2.9.

Scale posture: `dropDuplicatesWithinWatermark` keys the state store by
fingerprint and evicts an entry once the event-time watermark passes its
last-seen timestamp + the watermark delay — state is bounded by the
re-crawl window, not by corpus size (a global dedup against ALL history
is the batch job's role; at 100 TB you run both: bounded stream guard +
periodic batch sweep). The fingerprint is a JVM-side md5 over the same
`normalize_text` expression the batch path uses, so stream and batch
agree on what "identical content" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kgforge.functions.textstats import fingerprint


def dedup_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """First-seen rows only, keyed by normalized-content fingerprint.

    Streaming input: `dropDuplicatesWithinWatermark` (requires an
    event-time `ts_col`; a duplicate arriving within the watermark
    horizon of its first sighting is dropped, state evicts after it).
    Batch input: plain `dropDuplicates` on the same fingerprint — the
    deterministic-content twin used by tests to cross-check counts.
    Output carries the input columns plus `fp`.
    """
    with_fp = fingerprint(docs, text_col=text_col)
    if with_fp.isStreaming:
        return with_fp.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["fp"])
    return with_fp.dropDuplicates(["fp"])
