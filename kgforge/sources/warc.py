"""WARC ingestion: the Common Crawl wire format, parsed distributed.

Engine-new surface (the reference has no crawl-archive loader; ref
document_loaders/* stop at text/html/pdf/csv/jsonl/url): a web-scale
training-data pipeline ingests WARC — ISO 28500, the format Common Crawl
publishes — so the engine reads it natively with a pure-stdlib parser.

Format recap (all that this parser relies on):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Record-ID: <urn:uuid:...>\r\n
    WARC-Target-URI: https://...\r\n
    Content-Length: N\r\n           <- payload byte length, authoritative
    \r\n
    <N bytes of payload>\r\n\r\n    <- response payload = HTTP message

Records concatenate; Common Crawl gzips each record as its OWN gzip
member (so range requests can start at any member). `gzip.decompress`
walks multi-member streams, so one decompress handles both layouts.

Scale shape: `load_warc` is a `binaryFile` scan -> `mapInPandas` parser.
A WARC FILE is the unit of parallelism (the format is not arbitrarily
splittable — records are length-prefixed, and member-aligned splitting
needs an index); Common Crawl ships ~1 GB files in the tens of thousands
per crawl, so file-granular tasks saturate any cluster. Payload bytes
stay binary columns end-to-end (the multimodal rule); HTTP header
parsing happens once, inside the same Arrow batch, never per-row Python
in a downstream plan.
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.sources.html import html_to_text

_CRLF = b"\r\n"

# load_warc output schema (mapInPandas DDL)
WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, http_status int, http_content_type string, "
    "payload binary"
)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield raw records from WARC bytes (gzip'd — any member layout —
    or plain). Each dict: headers (dict, original case-insensitive keys
    lowered) + payload bytes. Tolerant of trailing garbage: parsing
    stops at the first spot that doesn't start a `WARC/` version line
    (truncated tail files surface as fewer records, not a crash).
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n or not data[pos:].startswith(b"WARC/"):
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        head = data[pos:head_end].split(_CRLF)
        for line in head[1:]:  # line 0 is the version
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would move `pos` BACKWARDS and loop the
            # generator on the same record forever
            return
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            return  # truncated record
        yield {"headers": headers, "payload": payload}
        pos = body_start + length


def split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP response message; a
    payload with no HTTP header block comes back (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    # real crawls archive RAW bytes, including non-compliant servers
    # that emit bare-LF heads — accept both delimiters
    head_end = payload.find(_CRLF + _CRLF)
    skip = 4
    if head_end < 0:
        head_end = payload.find(b"\n\n")
        skip = 2
    if head_end < 0:
        return None, None, payload
    lines = [
        ln.rstrip(b"\r") for ln in payload[:head_end].split(b"\n")
    ]
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("ascii", "replace")
    return status, ctype, payload[head_end + skip :]


# Spark's binaryFile source loads each file as ONE row and hard-caps the
# content column at Int.MaxValue bytes (the JVM array bound) — a larger
# file fails the scan at runtime, deep in a task. Guard up front instead.
_BINARYFILE_CAP = 2_147_483_647


def load_warc(
    spark: SparkSession,
    paths: list[str] | str,
    record_types: tuple[str, ...] = ("response",),
    max_file_bytes: int = _BINARYFILE_CAP,
) -> DataFrame:
    """Distributed WARC scan -> one row per record of the wanted types.

    Columns (`WARC_SCHEMA`): file, record_id, warc_type, target_uri,
    warc_date, http_status, http_content_type, payload (the HTTP BODY
    bytes for response records — headers already stripped — and the raw
    record payload otherwise). Filter/prune happens inside the Arrow
    batch, so unwanted record types (request/metadata/warcinfo) never
    leave the parser.

    Files larger than ``max_file_bytes`` (default: Spark's 2 GB
    binaryFile content cap) raise ValueError up front — naming the
    files — instead of failing mid-scan inside a task; the check reads
    only file-status metadata (path/length), never content. Oversized
    archives split losslessly at record boundaries with
    `split_warc_file` (standard Common Crawl files are ~1 GB and fit).
    ``max_file_bytes`` also serves as a per-task memory bound: each task
    materializes one file's bytes, so lowering it caps task memory.
    """
    wanted = {t.lower() for t in record_types} if record_types else None

    def parse_files(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(blob)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "")
                    if wanted is not None and wtype.lower() not in wanted:
                        continue
                    status, ctype, body = split_http_payload(rec["payload"])
                    rows.append(
                        (
                            path,
                            h.get("warc-record-id"),
                            wtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "record_id", "warc_type", "target_uri",
                    "warc_date", "http_status", "http_content_type",
                    "payload",
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
            f"WARC file(s) exceed the {cap}-byte per-file bound "
            f"(Spark binaryFile caps content at {_BINARYFILE_CAP} B and "
            f"each file is one task's memory): {names}. Split them at "
            "record boundaries first — kgforge.sources.warc."
            "split_warc_file(src, out_dir, target_bytes) is lossless."
        )
    return df.select("path", "content").mapInPandas(parse_files, WARC_SCHEMA)


def _iter_members(fh, gz: bool, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Stream a WARC file's atomic units — gzip members (gz=True, the
    Common Crawl member-per-record layout) or raw records (gz=False) —
    as byte blocks. Memory is bounded by ONE unit (a unit cannot be
    split further), never the file."""
    if gz:
        import zlib

        d = zlib.decompressobj(wbits=31)
        parts: list[bytes] = []
        while True:
            chunk = fh.read(chunk_size)
            if not chunk:
                if parts:
                    yield b"".join(parts)
                return
            buf = chunk
            while buf:
                d.decompress(buf)
                if d.eof:
                    used = len(buf) - len(d.unused_data)
                    parts.append(buf[:used])
                    yield b"".join(parts)
                    parts, buf = [], d.unused_data
                    d = zlib.decompressobj(wbits=31)
                else:
                    parts.append(buf)
                    buf = b""
    else:
        buf = b""
        while True:
            head_end = buf.find(b"\r\n\r\n")
            while head_end < 0:
                chunk = fh.read(chunk_size)
                if not chunk:
                    if buf.strip():
                        raise ValueError("truncated WARC record header")
                    return
                buf += chunk
                head_end = buf.find(b"\r\n\r\n")
            head = buf[:head_end]
            length = None
            for line in head.split(_CRLF):
                k, sep, v = line.partition(b":")
                if sep and k.strip().lower() == b"content-length":
                    length = int(v.strip())
            if length is None or length < 0:
                raise ValueError("WARC record without a valid Content-Length")
            total = head_end + 4 + length  # version+headers+sep+payload
            while len(buf) < total:
                chunk = fh.read(chunk_size)
                if not chunk:
                    break  # truncation-tolerant, like parse_warc
                buf += chunk
            # absorb inter-record blank lines into this unit (parse_warc
            # skips ANY number of them, so framing must not assume one)
            end = min(total, len(buf))
            while True:
                if buf[end : end + 2] == _CRLF:
                    end += 2
                    continue
                if end + 2 > len(buf):
                    chunk = fh.read(chunk_size)
                    if not chunk:
                        break
                    buf += chunk
                    continue
                break
            yield buf[:end]
            buf = buf[end:]


def split_warc_file(
    src_path: str, out_dir: str, target_bytes: int
) -> list[str]:
    """Split one oversized WARC file into shards ≤ ``target_bytes``
    each, LOSSLESSLY: shard boundaries fall only on record boundaries
    (gzip-member boundaries for .warc.gz — Common Crawl gzips each
    record as its own member, so members never split records), so the
    union of `load_warc` over the shards equals the original. Streaming
    and driver-side (this is a pre-ingest repair tool for files past the
    2 GB binaryFile cap): memory is bounded by one record, not the file.
    A single record larger than ``target_bytes`` becomes its own
    oversize shard (it cannot be split) — the caller sees it in the
    returned sizes. Returns the shard paths in order."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    gz = src_path.endswith(".gz")
    base = os.path.basename(src_path)
    if gz:
        stem = base[:-8] if base.endswith(".warc.gz") else base[:-3]
        ext = ".warc.gz"
    else:
        stem = base[:-5] if base.endswith(".warc") else base
        ext = ".warc"
    shards: list[str] = []
    cur: list[bytes] = []
    cur_bytes = 0

    def flush():
        nonlocal cur, cur_bytes
        if not cur:
            return
        path = os.path.join(out_dir, f"{stem}-{len(shards):05d}{ext}")
        with open(path, "wb") as out:
            for block in cur:
                out.write(block)
        shards.append(path)
        cur, cur_bytes = [], 0

    with open(src_path, "rb") as fh:
        for member in _iter_members(fh, gz):
            if cur and cur_bytes + len(member) > target_bytes:
                flush()
            cur.append(member)
            cur_bytes += len(member)
    flush()
    return shards


def warc_text_documents(
    spark: SparkSession, paths: list[str] | str
) -> DataFrame:
    """WARC responses -> text documents: (target_uri, content_type,
    text). text/html bodies run the bs4-parity extractor (same UDF as
    every other html path); text/* bodies decode as UTF-8 (replacement
    on bad bytes); other content types drop. 2xx responses only."""
    recs = load_warc(spark, paths, record_types=("response",))

    def to_text(batches):
        for pdf in batches:
            keep_uri, keep_ct, keep_text = [], [], []
            for uri, status, ctype, body in zip(
                pdf["target_uri"], pdf["http_status"],
                pdf["http_content_type"], pdf["payload"],
            ):
                if status is None or not 200 <= status < 300:
                    continue
                base = (ctype or "").split(";")[0].strip().lower()
                if base == "text/html":
                    text = html_to_text(bytes(body))
                elif base.startswith("text/"):
                    text = bytes(body).decode("utf-8", "replace")
                else:
                    continue
                keep_uri.append(uri)
                keep_ct.append(base)
                keep_text.append(text)
            yield pd.DataFrame(
                {
                    "target_uri": keep_uri,
                    "content_type": keep_ct,
                    "text": keep_text,
                }
            )

    return recs.mapInPandas(
        to_text, "target_uri string, content_type string, text string"
    )


def warc_pages(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """WARC responses -> the KG pipeline's PAGES contract (url, warc_ts,
    html, text, lang — plans/pipeline.py stage 01), so a crawl archive
    feeds run_pipeline directly: 2xx text/html responses only, raw html
    BYTES preserved for the in-UDF extractor and DOM wrappers (the
    pipeline's bs4-parity UDF does its own decode), warc_ts parsed from
    the record's WARC-Date, text/lang NULL (stage 01 fills text)."""
    recs = load_warc(spark, paths, record_types=("response",))

    def to_pages(batches):
        for pdf in batches:
            urls, dates, htmls = [], [], []
            for uri, date, status, ctype, body in zip(
                pdf["target_uri"], pdf["warc_date"], pdf["http_status"],
                pdf["http_content_type"], pdf["payload"],
            ):
                base = (ctype or "").split(";")[0].strip().lower()
                if status is None or not 200 <= status < 300:
                    continue
                if base != "text/html":
                    continue
                urls.append(uri)
                dates.append(date)
                htmls.append(bytes(body))
            yield pd.DataFrame(
                {"url": urls, "warc_date": dates, "html": htmls}
            )

    pages = recs.mapInPandas(
        to_pages, "url string, warc_date string, html binary"
    )
    return pages.select(
        "url",
        # WARC 1.0 dates are second-resolution; 1.1 allows fractional
        # seconds — strip the Z and let the ISO parser take both
        F.to_timestamp(F.regexp_replace("warc_date", "Z$", "")).alias(
            "warc_ts"
        ),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    text_col: str = "text",
    gzip_members: bool = True,
) -> DataFrame:
    """Distributed WARC sink: one member-gzipped WARC file per partition.

    The export half of the WARC story (re-publishing a curated corpus in
    the archive format downstream crawler tooling consumes): each task
    serializes its partition's rows as `response` records (text/plain
    HTTP payloads, UTF-8) into ``part-{partition_id:05d}.warc.gz`` under
    ``out_dir`` and emits one MANIFEST row (path, n_records, n_bytes) —
    the returned DataFrame is metadata-sized, the data plane never
    leaves the executors. Record ids/dates derive from the row's uri
    (no wall clock), so a rerun over identical partitioning reproduces
    identical bytes (`build_warc` pins gzip mtime=0). Round-trips
    through `load_warc`/`warc_text_documents` by construction.
    """
    import os

    def write_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs, n = [], 0
        for pdf in batches:
            for uri, text in zip(pdf[uri_col], pdf[text_col]):
                if text is None:
                    continue
                recs.append(
                    {
                        "warc_type": "response",
                        "record_id": f"<urn:kgforge:{uri}>",
                        "target_uri": uri,
                        "http_status": 200,
                        "http_content_type": "text/plain",
                        "http_body": str(text).encode("utf-8"),
                    }
                )
                n += 1
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        data = build_warc(recs, gzip_members=gzip_members)
        os.makedirs(out_dir, exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [len(data)]}
        )

    return df.select(uri_col, text_col).mapInPandas(
        write_partition, "path string, n_records long, n_bytes long"
    )


# --------------------------------------------------------------- writer


def build_warc(
    records: list[dict], gzip_members: bool = False
) -> bytes:
    """Serialize records to WARC bytes (the test/gate twin of
    `parse_warc`; also the deterministic synthesizer for fixtures).

    Each record dict: ``warc_type``, ``target_uri``, ``record_id``,
    ``warc_date`` (all optional but type), and either ``payload`` bytes
    (written verbatim) or ``http_body`` bytes + optional ``http_status``
    / ``http_content_type`` (wrapped in a minimal HTTP/1.1 response
    head, the Common Crawl response layout). ``gzip_members=True`` gzips
    each record as its own member (mtime pinned 0 — byte-deterministic).
    """
    out = bytearray()
    for rec in records:
        if "payload" in rec:
            payload = rec["payload"]
        else:
            status = rec.get("http_status", 200)
            ctype = rec.get("http_content_type", "text/plain")
            body = rec["http_body"]
            payload = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
        head = ["WARC/1.0"]
        head.append(f"WARC-Type: {rec['warc_type']}")
        for key, field in (
            ("WARC-Record-ID", "record_id"),
            ("WARC-Target-URI", "target_uri"),
            ("WARC-Date", "warc_date"),
        ):
            if rec.get(field):
                # raw CR/LF in a header value would break record framing
                # (valid URIs percent-encode them; data-derived ids may not)
                clean = re.sub(r"[\r\n]+", " ", str(rec[field]))
                head.append(f"{key}: {clean}")
        head.append(f"Content-Length: {len(payload)}")
        member = (
            # WARC/1.0 header values may be UTF-8 (IRIs in Target-URI);
            # the parser decodes utf-8 symmetrically
            "\r\n".join(head).encode("utf-8")
            + _CRLF * 2
            + payload
            + _CRLF * 2
        )
        if gzip_members:
            member = gzip.compress(member, mtime=0)
        out += member
    return bytes(out)
