"""Tar archive ingest: distributed member extraction from .tar/.tar.gz.

Big text dumps ship as tarballs of documents (The Pile components,
Project Gutenberg mirrors, arXiv source bundles) the same way crawls
ship as WARC — so the loader family (`SURVEY.md` S1-S7; factory
dispatch at `/root/reference/graphrag_sdk/source.py:31-42`) needs a tar
leg next to `sources/warc.py`. Same scale shape: `binaryFile` scan (one
row per archive, FILE is the parallelism unit) -> `mapInPandas` with
the pure-stdlib `tarfile` reader inside the Arrow batch; compression is
auto-detected (`r:*` handles plain, gzip, bz2, xz). The 2 GB
binaryFile cap is guarded up front by metadata like `load_warc`.

`build_tar` is the deterministic writer twin (mtime/uid pinned to 0 so
archives are byte-reproducible) used by the round-trip gate — the
`warc_ingest` pattern: synthesize archives from table rows, re-ingest
distributed, md5-compare against oracle expectations computed straight
from the table.
"""

from __future__ import annotations

import io
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources.warc import _BINARYFILE_CAP

TAR_SCHEMA = (
    "file string, member string, size long, mtime long, payload binary"
)


def parse_tar(data: bytes) -> list[tuple[str, int, int, bytes]]:
    """(member, size, mtime, payload) for every REGULAR file member, in
    archive order; directories/links/devices are skipped. Compression
    auto-detected."""
    out = []
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for m in tf:
            if not m.isreg():
                continue
            fh = tf.extractfile(m)
            payload = fh.read() if fh is not None else b""
            out.append((m.name, int(m.size), int(m.mtime), payload))
    return out


def build_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """Deterministic tar bytes: members in the given order, mtime/uid/
    gid pinned to 0 (byte-reproducible — the round-trip gate depends on
    it). `gz=True` wraps in gzip with mtime 0."""
    buf = io.BytesIO()
    mode = "w:gz" if gz else "w"
    with tarfile.open(
        fileobj=buf, mode=mode, format=tarfile.USTAR_FORMAT
    ) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def load_tar(
    spark: SparkSession,
    paths: list[str] | str,
    max_file_bytes: int = _BINARYFILE_CAP,
) -> DataFrame:
    """Distributed tar scan -> one row per regular member
    (`TAR_SCHEMA`). One task materializes one archive's bytes, so
    `max_file_bytes` is the per-task memory bound; oversized archives
    raise up front by metadata (split them into multiple tarballs —
    unlike WARC there is no in-archive record framing to split on when
    gzip-compressed whole)."""

    def parse_files(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for name, size, mtime, payload in parse_tar(bytes(blob)):
                    rows.append((path, name, size, mtime, payload))
            yield pd.DataFrame(
                rows,
                columns=["file", "member", "size", "mtime", "payload"],
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
            f"tar file(s) exceed the {cap}-byte per-file bound: {names}."
            " Repack into smaller tarballs."
        )
    return df.select("path", "content").mapInPandas(parse_files, TAR_SCHEMA)


def tar_text_documents(
    spark: SparkSession,
    paths: list[str] | str,
    encoding: str = "utf-8",
) -> DataFrame:
    """Member payloads decoded as text: (source, member, text) where
    source = '<archive>!<member>' — the loader-facade shape
    (`load_source` dispatches *.tar / *.tar.gz / *.tgz here).
    Undecodable bytes are replaced, not fatal (crawl-grade input;
    ANSI-mode binary->string casts would throw, so decoding happens in
    the Arrow batch)."""
    mem = load_tar(spark, paths)

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
