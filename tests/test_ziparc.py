"""ZIP ingest (sources/ziparc.py): round trip (stored + deflate),
determinism, directory skipping, cap guard, load_source dispatch."""

from __future__ import annotations

import io
import zipfile

import pytest

from kgforge.sources.ziparc import (
    build_zip,
    load_zip,
    parse_zip,
    zip_text_documents,
)

MEMBERS = [
    ("a/one.txt", b"hello zip"),
    ("a/two.txt", b""),
    ("b/three.bin", bytes(range(256))),
]


def test_parse_zip_round_trip_stored_and_deflate():
    for compress in (False, True):
        data = build_zip(MEMBERS, compress=compress)
        got = parse_zip(data)
        assert [(n, p) for n, _, _, p in got] == MEMBERS
        assert [s for _, s, _, _ in got] == [9, 0, 256]


def test_build_zip_is_byte_deterministic():
    assert build_zip(MEMBERS) == build_zip(MEMBERS)
    assert build_zip(MEMBERS, compress=True) == build_zip(
        MEMBERS, compress=True
    )


def test_parse_zip_skips_directories():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("dir/", b"")
        zf.writestr("dir/real.txt", b"ok")
    got = parse_zip(buf.getvalue())
    assert [(n, p) for n, _, _, p in got] == [("dir/real.txt", b"ok")]


def test_load_zip_distributed_and_cap_guard(spark, tmp_path):
    p1 = tmp_path / "x.zip"
    p2 = tmp_path / "y.zip"
    p1.write_bytes(build_zip(MEMBERS[:2]))
    p2.write_bytes(build_zip(MEMBERS[2:], compress=True))
    out = load_zip(spark, [str(p1), str(p2)]).collect()
    assert {(r.member, bytes(r.payload)) for r in out} == set(MEMBERS)
    with pytest.raises(ValueError, match="per-file bound"):
        load_zip(spark, [str(p1)], max_file_bytes=10)


def test_load_source_dispatches_zip(spark, tmp_path):
    from kgforge.sources.loaders import load_source

    p = tmp_path / "docs.zip"
    p.write_bytes(build_zip([("d1.txt", b"alpha"), ("d2.txt", b"beta")]))
    out = load_source(spark, str(p)).collect()
    assert sorted(r.content for r in out) == ["alpha", "beta"]
    assert all("docs.zip!" in r.source for r in out)


def test_zip_text_documents_replaces_undecodable(spark, tmp_path):
    p = tmp_path / "bad.zip"
    p.write_bytes(build_zip([("u.txt", b"caf\xe9")]))
    row = zip_text_documents(spark, [str(p)]).collect()[0]
    assert row.text == "caf�"
