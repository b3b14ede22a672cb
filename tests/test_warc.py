"""WARC ingestion (sources/warc.py): round-trip build->parse exactness,
multi-member gzip (the Common Crawl layout), HTTP splitting, record-type
pruning, html-vs-text body handling, factory dispatch, truncation
tolerance."""

from __future__ import annotations

import gzip
import os

import pytest

from kgforge.sources.warc import (
    build_warc, load_warc, parse_warc, split_http_payload,
    warc_text_documents,
)

WORK = "/root/repo/.work/warc_tests"


def _sample_records():
    return [
        {
            "warc_type": "warcinfo",
            "record_id": "<urn:uuid:info-1>",
            "payload": b"software: kgforge-test\r\n",
        },
        {
            "warc_type": "request",
            "target_uri": "https://a.example/x",
            "payload": b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:resp-1>",
            "target_uri": "https://a.example/x",
            "warc_date": "2026-01-01T00:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "http_body": b"<html><body><p>Hello <b>WARC</b></p></body></html>",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:resp-2>",
            "target_uri": "https://b.example/plain",
            "http_status": 200,
            "http_content_type": "text/plain",
            "http_body": "plain body é".encode("utf-8"),
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:resp-404>",
            "target_uri": "https://b.example/gone",
            "http_status": 404,
            "http_content_type": "text/plain",
            "http_body": b"not found",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:resp-bin>",
            "target_uri": "https://b.example/img",
            "http_status": 200,
            "http_content_type": "image/png",
            "http_body": b"\x89PNG\r\n\x1a\n....",
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_build_parse_roundtrip(gz):
    data = build_warc(_sample_records(), gzip_members=gz)
    recs = list(parse_warc(data))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
        "response",
    ]
    resp = recs[2]
    assert resp["headers"]["warc-target-uri"] == "https://a.example/x"
    status, ctype, body = split_http_payload(resp["payload"])
    assert (status, ctype) == (200, "text/html; charset=utf-8")
    assert body == b"<html><body><p>Hello <b>WARC</b></p></body></html>"
    # non-HTTP payload passes through untouched
    assert split_http_payload(recs[0]["payload"]) == (
        None, None, b"software: kgforge-test\r\n"
    )


def test_gzip_members_are_independent():
    """Common Crawl layout: each record its own gzip member; a single
    member alone must also parse (range-request reads start anywhere)."""
    data = build_warc(_sample_records(), gzip_members=True)
    # decompress the FIRST member only
    d = gzip.zlib.decompressobj(31)
    first = d.decompress(data)
    assert first.startswith(b"WARC/1.0")
    assert len(list(parse_warc(gzip.compress(first, mtime=0)))) == 1
    assert d.unused_data  # more members follow


def test_parse_tolerates_truncation():
    data = build_warc(_sample_records())
    cut = data[: len(data) - len(data) // 3]
    recs = list(parse_warc(cut))
    assert 0 < len(recs) < 6  # prefix records survive, no crash
    assert list(parse_warc(b"")) == []
    assert list(parse_warc(b"garbage not warc")) == []


def _write(path: str, data: bytes) -> str:
    os.makedirs(WORK, exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def test_load_warc_distributed(spark):
    p1 = _write(f"{WORK}/a.warc", build_warc(_sample_records()))
    p2 = _write(
        f"{WORK}/b.warc.gz", build_warc(_sample_records(), gzip_members=True)
    )
    out = load_warc(spark, [p1, p2]).collect()
    # responses only (default), 4 per file
    assert len(out) == 8
    assert {r.warc_type for r in out} == {"response"}
    by_uri = {
        (r.file.endswith("b.warc.gz"), r.target_uri): r for r in out
    }
    r = by_uri[(False, "https://a.example/x")]
    assert r.http_status == 200
    assert bytes(r.payload).startswith(b"<html>")
    # all types when asked
    allrecs = load_warc(spark, [p1], record_types=()).collect()
    assert len(allrecs) == 6 or {r.warc_type for r in allrecs} >= {
        "warcinfo", "request", "response"
    }


def test_warc_text_documents_and_dispatch(spark):
    from kgforge.sources.html import html_to_text
    from kgforge.sources.loaders import load_source

    p = _write(
        f"{WORK}/c.warc.gz", build_warc(_sample_records(), gzip_members=True)
    )
    docs = {r.target_uri: r for r in warc_text_documents(spark, [p]).collect()}
    # 404 and image/png dropped; html extracted with the parity parser
    assert set(docs) == {"https://a.example/x", "https://b.example/plain"}
    assert docs["https://a.example/x"].text == html_to_text(
        b"<html><body><p>Hello <b>WARC</b></p></body></html>"
    )
    assert docs["https://b.example/plain"].text == "plain body é"
    assert docs["https://b.example/plain"].content_type == "text/plain"
    # S7 factory routes *.warc / *.warc.gz
    via_factory = {r.source: r.content for r in load_source(spark, p).collect()}
    assert via_factory["https://b.example/plain"] == "plain body é"


def test_write_warc_roundtrip(spark):
    """Distributed sink: one WARC file per partition + a metadata-sized
    manifest; re-ingesting through warc_text_documents reproduces the
    exact (uri, text) set; NULL texts drop."""
    import shutil

    from kgforge.sources.warc import write_warc

    out_dir = f"{WORK}/sink_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    rows = [(f"https://ex.com/{i}", f"text {i} é") for i in range(37)]
    rows.append(("https://ex.com/null", None))
    df = spark.createDataFrame(
        rows, "target_uri string, text string"
    ).repartition(4)
    manifest = write_warc(df, out_dir).collect()
    assert len(manifest) == 4
    assert sum(r.n_records for r in manifest) == 37
    assert all(r.path.endswith(".warc.gz") for r in manifest)
    back = {
        (r.target_uri, r.text)
        for r in warc_text_documents(
            spark, [r.path for r in manifest]
        ).collect()
    }
    assert back == set(rows[:-1])


def test_warc_pages_feed_the_pipeline(spark, workdir):
    """Crawl-archive e2e: corpus pages -> WARC files -> warc_pages ->
    run_pipeline produces the SAME triples as running the pipeline on
    the in-memory pages (proving WARC is a first-class pipeline source,
    not just a parser)."""
    import shutil

    from kgforge.plans.pipeline import run_pipeline
    from kgforge.sources.pages import (
        corpus_to_spark, generate_corpus, movies_ontology,
    )
    from kgforge.sources.warc import warc_pages

    c = generate_corpus(n_pages=16, seed=7)
    pages, _, _ = corpus_to_spark(spark, c)
    with_html = [p for p in c.pages if p["html"]]
    assert len(with_html) >= 10
    recs = [
        {
            "warc_type": "response",
            "record_id": f"<urn:kgforge:{p['url']}>",
            "target_uri": p["url"],
            "warc_date": p["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
            "http_status": 200,
            "http_content_type": "text/html; charset=utf-8",
            "http_body": p["html"]
            if isinstance(p["html"], bytes)
            else p["html"].encode("utf-8"),
        }
        for p in with_html
    ]
    path = f"{WORK}/pipeline.warc.gz"
    _write(path, build_warc(recs, gzip_members=True))

    wp = warc_pages(spark, [path])
    assert wp.columns == ["url", "warc_ts", "html", "text", "lang"]
    for d in (f"{workdir}/direct", f"{workdir}/via_warc"):
        shutil.rmtree(d, ignore_errors=True)
    keep = {p["url"] for p in with_html}
    direct = run_pipeline(
        spark,
        pages.where(pages.url.isin(keep)),
        movies_ontology(),
        f"{workdir}/direct",
    )
    via = run_pipeline(spark, wp, movies_ontology(), f"{workdir}/via_warc")

    def tri(out):
        return {
            (r.subj_label, r.subj_key, r.pred, r.obj_label, r.obj_key)
            for r in out["triples"].select(
                "subj_label", "subj_key", "pred", "obj_label", "obj_key"
            ).collect()
        }

    a, b = tri(direct), tri(via)
    assert a == b and len(a) > 0


def test_parse_warc_negative_length_and_bare_lf_http():
    """Review fixes: a negative Content-Length must terminate parsing
    (not loop the generator); bare-LF HTTP heads still split."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -64\r\n\r\n"
    )
    assert list(parse_warc(bad)) == []
    good_then_bad = build_warc(_sample_records()[:1]) + bad
    assert len(list(parse_warc(good_then_bad))) == 1
    # bare-LF head (non-compliant server, raw bytes archived)
    status, ctype, body = split_http_payload(
        b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nhello"
    )
    assert (status, ctype, body) == (200, "text/plain", b"hello")


def test_warc_pages_fractional_second_dates(spark):
    """WARC/1.1 fractional-second WARC-Date must parse, not NULL."""
    recs = [
        {
            "warc_type": "response",
            "target_uri": "https://ex.com/frac",
            "warc_date": "2026-01-01T12:00:00.123456Z",
            "http_status": 200,
            "http_content_type": "text/html",
            "http_body": b"<p>x</p>",
        },
        {
            "warc_type": "response",
            "target_uri": "https://ex.com/whole",
            "warc_date": "2026-01-01T12:00:00Z",
            "http_status": 200,
            "http_content_type": "text/html",
            "http_body": b"<p>y</p>",
        },
    ]
    from kgforge.sources.warc import warc_pages

    p = _write(f"{WORK}/frac.warc", build_warc(recs))
    out = {r.url: r.warc_ts for r in warc_pages(spark, [p]).collect()}
    assert out["https://ex.com/frac"] is not None
    assert out["https://ex.com/frac"].microsecond == 123456
    assert out["https://ex.com/whole"] is not None


# ------------------------------------------- oversize guard + splitter


def test_load_warc_oversize_guard(spark):
    """VERDICT r04 #7: files past the binaryFile cap raise UP FRONT with
    the file name, the bound, and the repair helper — not mid-task.
    Synthetic small cap injection via max_file_bytes."""
    p = _write(f"{WORK}/big.warc", build_warc(_sample_records()))
    size = os.path.getsize(p)
    with pytest.raises(ValueError, match="split_warc_file") as ei:
        load_warc(spark, [p], max_file_bytes=size - 1)
    assert "big.warc" in str(ei.value)
    assert str(size - 1) in str(ei.value)
    # at or above the file size: loads fine
    assert len(load_warc(spark, [p], max_file_bytes=size).collect()) == 4


@pytest.mark.parametrize("gz", [False, True])
def test_split_warc_file_lossless(spark, gz):
    """split_warc_file shards at record/gzip-member boundaries: every
    shard ≤ target (single-record shards may exceed — can't split a
    record), and load_warc over the shards equals the original file
    record-for-record (ids, types, payload bytes)."""
    import hashlib

    from kgforge.sources.warc import split_warc_file

    recs = _sample_records() * 5  # 30 records
    ext = "warc.gz" if gz else "warc"
    p = _write(f"{WORK}/tosplit.{ext}", build_warc(recs, gzip_members=gz))
    out_dir = f"{WORK}/shards_{ext.replace('.', '_')}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    target = os.path.getsize(p) // 4 + 1
    shards = split_warc_file(p, out_dir, target)
    assert len(shards) >= 3
    # concatenation of shards == original bytes (losslessness at the
    # byte level, stronger than record equality)
    whole = b"".join(open(s, "rb").read() for s in shards)
    assert whole == open(p, "rb").read()

    def snap(paths):
        rows = load_warc(spark, paths, record_types=()).collect()
        return sorted(
            (r.record_id or "", r.warc_type or "", r.target_uri or "",
             hashlib.md5(bytes(r.payload)).hexdigest() if r.payload
             is not None else "")
            for r in rows
        )

    assert snap(shards) == snap([p])
    # all but possibly single-record shards respect the target
    multi = [s for s in shards if os.path.getsize(s) > target]
    for s in multi:
        n_recs = len(load_warc(spark, [s], record_types=()).collect())
        assert n_recs == 1  # only an unsplittable record may overflow
