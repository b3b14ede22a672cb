"""Loader parity (S1-S7): chunk shapes, floor-drop, factory dispatch."""

from __future__ import annotations

import pytest

from kgforge.sources.loaders import load_source


@pytest.fixture()
def files(tmp_path):
    txt = tmp_path / "doc.txt"
    txt.write_text("hello world\nsecond line\n")
    html = tmp_path / "page.html"
    html.write_text(
        "<html><head><style>x{}</style><script>var a=1;</script></head>"
        "<body><p>Alpha Beta.</p>\n\n<p>Gamma.</p></body></html>"
    )
    csv = tmp_path / "rows.csv"
    # 130 rows -> 2 full chunks of 50, remainder 30 dropped
    csv.write_text("".join(f"a{i},b{i}\n" for i in range(130)))
    jsonl = tmp_path / "rows.jsonl"
    jsonl.write_text("".join('{"k": %d}\n' % i for i in range(130)))
    return tmp_path


def test_text_loader(spark, files):
    out = load_source(spark, str(files / "doc.txt")).collect()
    assert len(out) == 1
    assert out[0].content == "hello world\nsecond line\n"


def test_html_loader_strips_boilerplate(spark, files):
    out = load_source(spark, str(files / "page.html")).collect()
    assert len(out) == 1
    assert "Alpha Beta." in out[0].content
    assert "var a=1" not in out[0].content
    assert "x{}" not in out[0].content
    assert "\n\n" not in out[0].content  # n{2,} collapse


def test_csv_loader_floor_drop(spark, files):
    out = load_source(spark, str(files / "rows.csv")).orderBy("doc_id").collect()
    assert len(out) == 2  # 130 // 50, remainder dropped
    lines = out[0].content.split("\n")
    assert len(lines) == 50
    assert lines[0] == "a0,b0"
    assert out[1].content.split("\n")[0] == "a50,b50"


def test_jsonl_loader_floor_drop(spark, files):
    out = load_source(spark, str(files / "rows.jsonl")).orderBy("doc_id").collect()
    assert len(out) == 2
    # each raw line keeps its trailing newline, then lines join by "\n"
    assert out[0].content.startswith('{"k": 0}\n\n{"k": 1}\n')


def test_pdf_loader_gated(spark, files):
    pdf = files / "x.pdf"
    pdf.write_bytes(b"%PDF-fake")
    try:
        import pypdf  # noqa: F401

        has_pypdf = True
    except ImportError:
        has_pypdf = False
    if not has_pypdf:
        with pytest.raises(NotImplementedError):
            load_source(spark, str(pdf))


def test_url_rejected(spark):
    with pytest.raises(NotImplementedError):
        load_source(spark, "https://example.com/x")
