"""mbox mailbox parsing — email archives as a corpus source (the
Enron-corpus / mailing-list-dump ingestion shape).

An mbox file concatenates messages, each introduced by a postmark line
beginning ``From `` at column 0; body lines that would collide are
escaped as ``>From `` (mboxrd). At ingest scale this is a column
transform over millions of fetched mailbox blobs — one row per mailbox
in, one row per message out — so the parser is pure Spark expressions
(split + substring + regexp_extract), never a per-row email library:
one WholeStageCodegen pass plus the message explode.

Subset honestly supported: mboxrd postmark quoting (one ``>`` level),
single-line headers (RFC 5322 folded continuation lines stay inside the
raw header block but are not unfolded into the extracted fields),
case-sensitive canonical header names (``From:``, ``To:``, ``Subject:``,
``Date:``, ``Message-ID:``). All patterns are RE2-portable and the
splits are literal, so the DuckDB driver oracle replays the exact same
algebra (the sitemap.py certification pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEADERS = ["From", "To", "Subject", "Date", "Message-ID"]


def _header(block: Column, name: str) -> Column:
    got = F.regexp_extract(
        block, r"(?:^|\n)" + name + r": ([^\n]*)", 1
    )
    return F.when(got != "", got)


def parse_mbox(
    df: DataFrame, mbox_col: str = "mbox", id_cols: list[str] | None = None
) -> DataFrame:
    """One row per message: (*id_cols, msg_index, from_line, hdr_from,
    hdr_to, hdr_subject, hdr_date, hdr_message_id, body).

    ``from_line`` is the postmark remainder (sender + timestamp as
    written); absent headers come back NULL; ``body`` is everything
    after the first blank line with mboxrd ``>From `` unescaped; a
    message with no blank line yields body NULL (headers-only)."""
    ids = list(id_cols or [])
    nl = "\n"
    # '\n' + doc, split on '\nFrom ' -> element 0 is pre-postmark junk
    # (empty for a well-formed mbox), elements 1.. are messages
    msgs = F.split(
        F.concat(F.lit(nl), F.col(mbox_col)), F.lit(nl + "From ")
    )
    d = df.select(
        *ids, F.posexplode(msgs).alias("__i", "__m")
    ).where(F.col("__i") >= 1)
    first_nl = F.instr(F.col("__m"), nl)
    from_line = F.when(
        first_nl > 0, F.substring(F.col("__m"), 1, first_nl - 1)
    ).otherwise(F.col("__m"))
    rest = F.when(
        first_nl > 0,
        F.substring(
            F.col("__m"), first_nl + 1, F.length("__m")
        ),
    ).otherwise(F.lit(""))
    d = d.select(
        *ids,
        (F.col("__i") - 1).cast("long").alias("msg_index"),
        from_line.alias("from_line"),
        rest.alias("__rest"),
    )
    blank = F.instr(F.col("__rest"), nl + nl)
    hdr_block = F.when(blank > 0, F.substring(F.col("__rest"), 1, blank - 1)
                       ).otherwise(F.col("__rest"))
    body_raw = F.when(
        blank > 0,
        F.substring(
            F.col("__rest"), blank + 2, F.length("__rest")
        ),
    )
    body = F.regexp_replace(body_raw, r"(^|\n)>From ", r"$1From ")
    return d.select(
        *ids,
        "msg_index",
        "from_line",
        _header(hdr_block, "From").alias("hdr_from"),
        _header(hdr_block, "To").alias("hdr_to"),
        _header(hdr_block, "Subject").alias("hdr_subject"),
        _header(hdr_block, "Date").alias("hdr_date"),
        _header(hdr_block, "Message-ID").alias("hdr_message_id"),
        body.alias("body"),
    )
