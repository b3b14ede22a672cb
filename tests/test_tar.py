"""Tar ingest (sources/tar.py): parser round trip, compression
auto-detect, non-regular member skipping, the binaryFile cap guard, and
the load_source dispatch."""

from __future__ import annotations

import io
import tarfile

import pytest

from kgforge.sources.tar import (
    build_tar,
    load_tar,
    parse_tar,
    tar_text_documents,
)

MEMBERS = [
    ("a/one.txt", b"hello tar"),
    ("a/two.txt", b""),
    ("b/three.bin", bytes(range(256))),
]


def test_parse_tar_round_trip_plain_and_gz():
    for gz in (False, True):
        data = build_tar(MEMBERS, gz=gz)
        got = parse_tar(data)
        assert [(n, p) for n, _, _, p in got] == MEMBERS
        assert [s for _, s, _, _ in got] == [9, 0, 256]
        assert all(m == 0 for _, _, m, _ in got)  # pinned mtime


def test_build_tar_is_byte_deterministic():
    assert build_tar(MEMBERS) == build_tar(MEMBERS)
    assert build_tar(MEMBERS, gz=True) == build_tar(MEMBERS, gz=True)


def test_parse_tar_skips_non_regular_members():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        link = tarfile.TarInfo("lnk")
        link.type = tarfile.SYMTYPE
        link.linkname = "a/one.txt"
        tf.addfile(link)
        f = tarfile.TarInfo("real.txt")
        f.size = 2
        tf.addfile(f, io.BytesIO(b"ok"))
    got = parse_tar(buf.getvalue())
    assert [(n, p) for n, _, _, p in got] == [("real.txt", b"ok")]


def test_load_tar_distributed_and_cap_guard(spark, tmp_path):
    p1 = tmp_path / "x.tar"
    p2 = tmp_path / "y.tar.gz"
    p1.write_bytes(build_tar(MEMBERS[:2]))
    p2.write_bytes(build_tar(MEMBERS[2:], gz=True))
    out = load_tar(spark, [str(p1), str(p2)]).collect()
    assert {(r.member, bytes(r.payload)) for r in out} == set(MEMBERS)
    with pytest.raises(ValueError, match="per-file bound"):
        load_tar(spark, [str(p1)], max_file_bytes=10)


def test_tar_text_documents_replaces_undecodable(spark, tmp_path):
    p = tmp_path / "bad.tar"
    p.write_bytes(build_tar([("u.txt", b"caf\xe9")]))  # latin-1 bytes
    row = tar_text_documents(spark, [str(p)]).collect()[0]
    assert row.text == "caf�"
    assert row.source.endswith("bad.tar!u.txt")


def test_load_source_dispatches_tar(spark, tmp_path):
    from kgforge.sources.loaders import load_source

    p = tmp_path / "docs.tgz"
    p.write_bytes(build_tar([("d1.txt", b"alpha"), ("d2.txt", b"beta")], gz=True))
    out = load_source(spark, str(p)).collect()
    assert sorted(r.content for r in out) == ["alpha", "beta"]
    assert all("docs.tgz!" in r.source for r in out)
