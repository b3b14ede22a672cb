"""ZIP archive ingest: distributed member extraction from .zip files.

Completes the archive leg of the loader family (WARC for crawls, tar
for dump tarballs, mbox for mail, ZIP for the long tail of dataset
drops — Kaggle exports, GitHub release archives, EPUB/DOCX containers).
Same scale shape as `sources/tar.py`: `binaryFile` scan (one row per
archive, FILE is the parallelism unit, 2 GB cap guarded by metadata) ->
stdlib `zipfile` inside `mapInPandas`. ZIP's central directory sits at
the END of the file, so unlike WARC there is no record-streaming split
for oversized archives — repack instead (the guard says so).

`build_zip` is the deterministic writer twin (fixed 1980-01-01
timestamps, no extra fields, ZIP_STORED by default) used by the
round-trip gate per the warc/tar pattern.
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources.warc import _BINARYFILE_CAP

ZIP_SCHEMA = (
    "file string, member string, size long, compressed long, "
    "payload binary"
)


def parse_zip(data: bytes) -> list[tuple[str, int, int, bytes]]:
    """(member, size, compressed_size, payload) for every FILE member
    in central-directory order; directory entries are skipped."""
    out = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            out.append(
                (
                    info.filename,
                    int(info.file_size),
                    int(info.compress_size),
                    zf.read(info),
                )
            )
    return out


def build_zip(
    members: list[tuple[str, bytes]], compress: bool = False
) -> bytes:
    """Deterministic ZIP bytes: members in the given order, timestamps
    pinned to the DOS epoch (1980-01-01), no extra fields —
    byte-reproducible for the round-trip gate."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, payload)
    return buf.getvalue()


def load_zip(
    spark: SparkSession,
    paths: list[str] | str,
    max_file_bytes: int = _BINARYFILE_CAP,
) -> DataFrame:
    """Distributed ZIP scan -> one row per file member (`ZIP_SCHEMA`).
    One task materializes one archive; `max_file_bytes` bounds task
    memory and oversized archives raise up front by metadata."""

    def parse_files(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for name, size, comp, payload in parse_zip(bytes(blob)):
                    rows.append((path, name, size, comp, payload))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "member", "size", "compressed", "payload",
                ],
            )

    df = spark.read.format("binaryFile").load(paths)
    cap = min(int(max_file_bytes), _BINARYFILE_CAP)
    oversized = (
        df.filter(F.col("length") > cap)
        .select("path", "length")
        .limit(5)
        .collect()
    )
    if oversized:
        names = ", ".join(f"{r.path} ({r.length} B)" for r in oversized)
        raise ValueError(
            f"zip file(s) exceed the {cap}-byte per-file bound: {names}."
            " Repack into smaller archives (ZIP's central directory"
            " sits at EOF — there is no record-boundary split)."
        )
    return df.select("path", "content").mapInPandas(parse_files, ZIP_SCHEMA)


def zip_text_documents(
    spark: SparkSession,
    paths: list[str] | str,
    encoding: str = "utf-8",
) -> DataFrame:
    """Member payloads decoded as text: (source, member, text) with
    source = '<archive>!<member>' — the loader-facade shape
    (`load_source` dispatches *.zip here). Bad bytes are replaced in
    the Arrow batch (ANSI binary->string casts throw)."""
    mem = load_zip(spark, paths)

    def to_text(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "source": pdf["file"] + "!" + pdf["member"],
                    "member": pdf["member"],
                    "text": [
                        bytes(b).decode(encoding, errors="replace")
                        for b in pdf["payload"]
                    ],
                }
            )

    return mem.mapInPandas(
        to_text, "source string, member string, text string"
    )
