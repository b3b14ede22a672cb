"""Row-chunking loaders (CSV / JSONL) with reference floor-drop parity.

Reference semantics (/root/reference/graphrag_sdk/document_loaders/csv.py:15-32,
jsonl.py:14-27): read all rows, emit documents of `rows_per_document` rows
joined by "\\n" (CSV cells re-joined by ","); ``num_documents = num_rows //
rows_per_document`` — the tail remainder is silently DROPPED. Factory defaults:
50 rows/doc (source.py:150,160); loader default 500.

Spark realization: a window row_number over an explicit order column gives a
stable global row index; ``floor(rn / k)`` groups rows into chunks;
``count == k`` filter reproduces the remainder drop. The global window is a
single-partition sort — fine for the loader path (file-sized inputs); at 100 TB
chunking is done per-file via the `part_col` argument, which windows
*within* each file (partitionBy) and keeps the sort distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_rows(
    df: DataFrame,
    text_col: str,
    order_col: str,
    rows_per_document: int = 50,
    part_col: str | None = None,
    out_col: str = "content",
) -> DataFrame:
    """Group consecutive rows into documents of exactly `rows_per_document`.

    Returns (part_col?, chunk_id, content) with the remainder chunk dropped.
    """
    if part_col is None:
        w = Window.orderBy(order_col)
        keys = []
    else:
        w = Window.partitionBy(part_col).orderBy(order_col)
        keys = [part_col]
    chunked = df.withColumn("_rn", F.row_number().over(w) - F.lit(1)).withColumn(
        "chunk_id", (F.col("_rn") / rows_per_document).cast("long")
    )
    agg = (
        chunked.groupBy(*keys, "chunk_id")
        .agg(
            F.concat_ws(
                "\n", F.array_sort(F.collect_list(F.struct("_rn", text_col))).getField(
                    text_col
                )
            ).alias(out_col),
            F.count("*").alias("_n"),
        )
        # remainder drop: only full chunks survive (csv.py:20 floor division)
        .filter(F.col("_n") == rows_per_document)
        .drop("_n")
    )
    return agg


def chunk_jsonl(
    df: DataFrame, line_col: str, order_col: str, rows_per_document: int = 50,
    part_col=None,
) -> DataFrame:
    """JSONL chunker parity: raw lines (no JSON parse), each line keeps its
    trailing "\\n" (readlines), then joined by "\\n" (jsonl.py:16-27)."""
    with_nl = df.withColumn("_line", F.concat(F.col(line_col), F.lit("\n")))
    return chunk_rows(with_nl, "_line", order_col, rows_per_document, part_col)


def chunk_csv(
    df: DataFrame, order_col: str, rows_per_document: int = 50, part_col=None
) -> DataFrame:
    """CSV chunker: cells joined by "," then rows by "\\n" (csv.py:22-30)."""
    cols = [c for c in df.columns if c != order_col and c != part_col]
    joined = df.withColumn("_line", F.concat_ws(",", *cols))
    return chunk_rows(
        joined, "_line", order_col, rows_per_document, part_col=part_col
    )


def window_chunks(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG/embedding prep shape).

    Each document's whitespace tokens are cut into windows of `size`
    tokens advancing by ``step = size - overlap``; window i covers
    tokens ``[i*step, i*step + size)`` so consecutive chunks share
    `overlap` tokens. A document always yields >= 1 chunk (short docs
    produce one partial chunk); NULL-text docs yield none. Output:
    (id, chunk_idx, chunk, n_chunk_tokens), deterministic per document.

    Scale shape: pure built-in expressions — the token array is
    materialized ONCE per row in a projection (HOF subexpressions are
    not CSE'd; an inline `toks` inside the lambda would re-split the
    text per window), then one `transform` + `posexplode`. No shuffle,
    no window function, no Python: chunking 100 TB is a map-only stage.
    """
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    step = size - overlap
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    k = F.greatest(
        F.ceil((F.size("__toks") - F.lit(overlap)) / F.lit(step)).cast(
            "int"
        ),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(
            F.slice("__toks", i * step + 1, size), " "
        ),
    )
    return (
        base.select("id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .withColumn(
            "n_chunk_tokens", F.size(F.split(F.col("chunk"), r"\s+"))
        )
    )


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask: str = "0",
) -> DataFrame:
    """Content-defined chunking (FastCDC-family): split each document
    at positions where the hash of the next ``window`` characters
    starts with ``mask`` hex zeros -> (id_col, chunk_idx, chunk_start,
    chunk_len, chunk_md5), 1-based starts.

    Content-defined boundaries survive insertions/deletions (a one-word
    edit re-chunks only its neighborhood, unlike fixed-size windows
    that shift every downstream chunk), which is what makes the chunk
    fingerprint table the unit of cross-document / cross-snapshot
    dedup: groupBy(chunk_md5) finds shared content between revisions
    that whole-doc hashing misses. Expected chunk length is
    16^len(mask) characters.

    Deliberately NO min/max-chunk clamping: FastCDC's min-skip makes
    each boundary depend on the previous one (a sequential recurrence),
    while "every qualifying window is a boundary" is position-local —
    pure built-in expressions (one scan, zero shuffles, zero Python)
    and SQL-replayable positionally by the driver gate's oracle. The
    boundary array is materialized ONCE in a separate projection (the
    repo's HOF-CSE rule) before starts/ends both read it.
    """
    if window < 1 or not mask:
        raise ValueError("window >= 1 and non-empty mask required")
    t = F.col(text_col)
    npos = F.length(t) - window + 1  # last window start that fits
    pos = F.when(npos >= 2, F.sequence(F.lit(2), npos)).otherwise(
        F.array().cast("array<int>")
    )
    is_boundary = lambda i: F.md5(
        F.encode(t.substr(i, F.lit(window)), "utf-8")
    ).startswith(mask)
    step1 = (
        docs.where(t.isNotNull())
        .select(
            F.col(id_col),
            t,
            F.filter(pos, is_boundary).alias("__bounds"),
        )
    )
    starts = F.concat(F.array(F.lit(1)), F.col("__bounds"))
    ends = F.concat(F.col("__bounds"), F.array(F.length(t) + 1))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(s.alias("s"), (e - s).alias("ln")),
    )
    ex = step1.select(
        F.col(id_col),
        t,
        F.posexplode(chunks).alias("chunk_idx", "c"),
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.s").cast("long").alias("chunk_start"),
        F.col("c.ln").cast("long").alias("chunk_len"),
        F.md5(
            F.encode(t.substr(F.col("c.s"), F.col("c.ln")), "utf-8")
        ).alias("chunk_md5"),
    )
