"""Source loaders + extension-dispatch factory (SURVEY §2.1 S1-S7).

Reference surface (/root/reference/graphrag_sdk/source.py:31-42): the factory
sniffs the path extension — .pdf -> PDF, .html -> HTML, http -> URL,
.csv -> CSV, .jsonl -> JSONL, else TEXT — and each loader emits Document
rows. Here every loader returns a DataFrame

    (source string, doc_id long, content string)

so the extraction pipeline can consume any of them uniformly (one row = one
Document, the reference's unit of extraction).

Scale notes: file reads use Spark's distributed readers (`text` with
wholetext per file list, `binaryFile` for HTML/PDF payloads, `csv`); the
chunkers window per-file (`part_col`), so no single-partition global sort at
scale. URL fetch (S4, `load_url`) runs distributed (stdlib urllib inside
mapInPandas) and feeds the SAME bs4-parity text UDF as the stored-bytes
path — but the scale stance is unchanged: at 10^12 pages the corpus
arrives as WARC/Iceberg `pages` rows with `html` already present, and
refetching is the crawler's job. `load_url` serves the reference's
interactive use case (a handful of URLs, document_loaders/url.py:22-50).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources.chunk import chunk_csv, chunk_jsonl
from kgforge.sources.html import extract_text_udf

ROWS_PER_DOCUMENT = 50  # factory default (source.py:150,160)


def _file_order() -> F.Column:
    """Within-file row order that survives multi-split files.

    `monotonically_increasing_id` alone is NOT file order: its high bits are
    the partition index, and Spark assigns file splits to partitions sorted
    by split SIZE (then packs several per partition), so a later byte range
    can get a smaller partition index. The split's byte offset
    (`_metadata.file_block_start`) ranks splits of one file correctly, and
    the monotonic id ranks rows within a split (read order) — the struct
    sorts lexicographically on (offset, seq), restoring sequential
    k-rows-per-document semantics (reference csv.py:15-32) at any split
    count.
    """
    return F.struct(
        F.col("_metadata.file_block_start").alias("off"),
        F.monotonically_increasing_id().alias("seq"),
    )


def load_text(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S1: whole file -> 1 Document (document_loaders/text.py:19-30)."""
    df = spark.read.text(paths, wholetext=True).withColumn(
        "source", F.input_file_name()
    )
    return df.select(
        "source", F.lit(0).cast("long").alias("doc_id"),
        F.col("value").alias("content"),
    )


def load_html(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S3: html bytes -> bs4-parity text, 1 Document per file
    (document_loaders/html.py:23-50)."""
    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.col("path").alias("source"),
        F.lit(0).cast("long").alias("doc_id"),
        extract_text_udf(F.col("content")).alias("content"),
    )


def load_csv(
    spark: SparkSession, paths: list[str], rows_per_document: int = ROWS_PER_DOCUMENT
) -> DataFrame:
    """S5: k rows -> 1 Document, cells re-joined by ",", floor-drop tail
    (document_loaders/csv.py:15-32)."""
    df = (
        spark.read.option("header", "false")
        .csv(paths)
        .withColumn("source", F.input_file_name())
        .withColumn("_order", _file_order())
    )
    chunks = chunk_csv(
        df, "_order", rows_per_document=rows_per_document, part_col="source"
    )
    return chunks.select(
        "source", F.col("chunk_id").alias("doc_id"), "content"
    )


def load_jsonl(
    spark: SparkSession, paths: list[str], rows_per_document: int = ROWS_PER_DOCUMENT
) -> DataFrame:
    """S6: k raw lines -> 1 Document, no JSON parse
    (document_loaders/jsonl.py:14-27)."""
    df = (
        spark.read.text(paths)
        .withColumn("source", F.input_file_name())
        .withColumn("_order", _file_order())
    )
    chunks = chunk_jsonl(
        df, "value", "_order", rows_per_document=rows_per_document,
        part_col="source",
    )
    return chunks.select(
        "source", F.col("chunk_id").alias("doc_id"), "content"
    )


def _pdf_pages_minimal(blob: bytes) -> list[str]:
    """Dependency-free page-text kernel (PDF 1.x spec, public).

    Scope: content streams that are plain or FlateDecode-compressed, with
    text shown via literal strings in ``Tj`` / ``'`` / ``TJ`` operators —
    i.e. the simple text-first PDFs the reference's loader contract is
    about (1 Document per page, document_loaders/pdf.py:26-39). Each
    text-carrying content stream is treated as one page in document order
    (true for linear single-stream-per-page files). Hex strings, CID/Type0
    encodings, and cross-reference-driven layout are out of scope — when
    pypdf is installed it is preferred and handles those.
    """
    import re as _re
    import zlib

    pages: list[str] = []
    for m in _re.finditer(rb"stream\r?\n(.*?)endstream", blob, _re.S):
        data = m.group(1)
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # already uncompressed
        if b"BT" not in data:
            continue  # not a text content stream (image XObject, fonts...)
        runs: list[str] = []
        # literal strings immediately feeding a show operator
        for sm in _re.finditer(
            rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')|\[((?:[^\]\\]|\\.)*)\]\s*TJ",
            data,
            _re.S,
        ):
            if sm.group(1) is not None:
                literals = [sm.group(1)]
            else:
                literals = [
                    lm.group(1)
                    for lm in _re.finditer(
                        rb"\(((?:[^()\\]|\\.)*)\)", sm.group(2), _re.S
                    )
                ]
            text = b"".join(literals)
            # unescape per spec 7.3.4.2: \n \r \t \b \f \( \) \\ \ddd
            text = _re.sub(
                rb"\\([0-7]{1,3}|.)",
                lambda e: (
                    bytes([int(e.group(1), 8)])
                    if e.group(1).isdigit()
                    else {
                        b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\f",
                    }.get(e.group(1), e.group(1))
                ),
                text,
            )
            runs.append(text.decode("latin-1"))
        if runs:
            pages.append("\n".join(runs))
    return pages


def load_pdf(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S2: 1 Document per page (reference document_loaders/pdf.py:26-39).

    The page-text kernel prefers pypdf (the reference's library) when
    importable; otherwise the minimal spec-based kernel above handles
    plain/Flate text streams. The Spark plumbing is identical either way:
    binaryFile scan -> Arrow-batched pages UDF -> posexplode, one row per
    page.
    """
    try:
        from pypdf import PdfReader

        def page_texts(blob: bytes) -> list[str]:
            import io

            return [
                p.extract_text() for p in PdfReader(io.BytesIO(blob)).pages
            ]
    except ImportError:  # container has no pypdf: spec-based fallback
        page_texts = _pdf_pages_minimal

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def pdf_pages(blobs: pd.Series) -> pd.Series:
        return pd.Series([page_texts(bytes(b)) for b in blobs])

    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.col("path").alias("source"),
        F.posexplode(pdf_pages(F.col("content"))).alias("doc_id", "content"),
    ).select("source", F.col("doc_id").cast("long"), "content")


def load_url(
    spark: SparkSession,
    urls: list[str],
    timeout: float = 10.0,
    max_bytes: int = 10_000_000,
    user_agent: str = "Mozilla/5.0",
) -> DataFrame:
    """S4: live URL fetch -> html -> text (document_loaders/url.py:22-50).

    The reference GETs each URL with a Mozilla User-Agent, extracts text
    with bs4 ``get_text`` and collapses blank lines. Here the fetch runs
    distributed — the URL list parallelizes across executors and each task
    fetches with stdlib ``urllib`` (no extra deps) — and the text step is
    the SAME bs4-parity UDF as the stored-bytes path (sources/html.py), so
    live and WARC ingestion produce byte-identical text. A failed fetch
    (HTTP error, timeout, bad host) yields ``content = NULL`` instead of
    failing the job; the P1 empty-doc filter drops such rows downstream
    (the reference prints the error and emits nothing,
    url.py:46-49 — same net effect, but audited).

    Scale stance unchanged: at crawl scale ingest WARC/pages tables; this
    is the reference's interactive few-URLs path.
    """

    def fetch_partition(batches):
        from urllib.request import Request, urlopen

        for pdf in batches:
            htmls = []
            for u in pdf["source"]:
                try:
                    req = Request(u, headers={"User-Agent": user_agent})
                    with urlopen(req, timeout=timeout) as resp:
                        raw = resp.read(max_bytes)
                        charset = (
                            resp.headers.get_content_charset() or "utf-8"
                        )
                    htmls.append(raw.decode(charset, errors="replace"))
                except Exception:
                    htmls.append(None)
            yield pd.DataFrame({"source": pdf["source"], "html": htmls})

    n_part = max(1, min(len(urls), spark.sparkContext.defaultParallelism))
    df = spark.createDataFrame(
        [(u,) for u in urls], "source string"
    ).repartition(n_part)
    fetched = df.mapInPandas(fetch_partition, "source string, html string")
    return fetched.select(
        "source",
        F.lit(0).cast("long").alias("doc_id"),
        extract_text_udf(F.col("html")).alias("content"),
    )


def load_source(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """S7 factory dispatch by extension (source.py:31-42).

    http(s) URLs dispatch to the distributed fetch path (`load_url`).
    """
    low = path.lower()
    if low.startswith("http://") or low.startswith("https://"):
        return load_url(spark, [path], **kwargs)
    if low.endswith(".zip"):
        from kgforge.sources.ziparc import zip_text_documents

        return zip_text_documents(spark, [path]).select(
            "source",
            F.lit(0).cast("long").alias("doc_id"),
            F.col("text").alias("content"),
        )
    if (
        low.endswith(".tar")
        or low.endswith(".tar.gz")
        or low.endswith(".tgz")
    ):
        from kgforge.sources.tar import tar_text_documents

        return tar_text_documents(spark, [path]).select(
            "source",
            F.lit(0).cast("long").alias("doc_id"),
            F.col("text").alias("content"),
        )
    if low.endswith(".warc") or low.endswith(".warc.gz"):
        from kgforge.sources.warc import warc_text_documents

        return warc_text_documents(spark, [path]).select(
            F.col("target_uri").alias("source"),
            F.lit(0).cast("long").alias("doc_id"),
            F.col("text").alias("content"),
        )
    if low.endswith(".pdf"):
        return load_pdf(spark, [path])
    if low.endswith(".html"):
        return load_html(spark, [path])
    if low.endswith(".csv"):
        return load_csv(spark, [path], **kwargs)
    if low.endswith(".jsonl"):
        return load_jsonl(spark, [path], **kwargs)
    return load_text(spark, [path])
