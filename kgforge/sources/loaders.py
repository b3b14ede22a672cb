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
scale. URL fetch (S4) is deliberately NOT implemented as a distributed
operator: at 10^12 pages the corpus arrives as WARC/Iceberg `pages` rows
with `html` already present — refetching is the crawler's job, not the
engine's (the S3 HTML path applies to the stored bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources.chunk import chunk_csv, chunk_jsonl
from kgforge.sources.html import extract_text_udf

ROWS_PER_DOCUMENT = 50  # factory default (source.py:150,160)


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
        .withColumn("_order", F.monotonically_increasing_id())
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
        .withColumn("_order", F.monotonically_increasing_id())
    )
    chunks = chunk_jsonl(
        df, "value", "_order", rows_per_document=rows_per_document,
        part_col="source",
    )
    return chunks.select(
        "source", F.col("chunk_id").alias("doc_id"), "content"
    )


def load_pdf(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S2: 1 Document per page via pypdf (document_loaders/pdf.py:26-39).

    pypdf is not installed in this container; the Spark plumbing (binaryFile
    scan -> per-page explode) is real, the page-text kernel import-gated.
    """
    try:
        from pypdf import PdfReader  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "PDF loading needs pypdf (reference document_loaders/pdf.py); "
            "not available in this container"
        ) from exc

    import io

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def pdf_pages(blobs: pd.Series) -> pd.Series:
        out = []
        for blob in blobs:
            reader = PdfReader(io.BytesIO(blob))
            out.append([p.extract_text() for p in reader.pages])
        return pd.Series(out)

    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.col("path").alias("source"),
        F.posexplode(pdf_pages(F.col("content"))).alias("doc_id", "content"),
    ).select("source", F.col("doc_id").cast("long"), "content")


def load_source(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """S7 factory dispatch by extension (source.py:31-42).

    http(s) URLs are rejected with guidance (see module docstring).
    """
    low = path.lower()
    if low.startswith("http"):
        raise NotImplementedError(
            "URL fetch is out of engine scope at corpus scale; ingest the "
            "crawl into a pages table and use the HTML path"
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
