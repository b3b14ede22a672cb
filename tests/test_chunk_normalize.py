"""S5/S6 chunker floor-drop parity + P3-P8 normalization/quarantine."""

from pyspark.sql import functions as F

from kgforge.operators import normalize
from kgforge.sources.chunk import chunk_csv, chunk_jsonl, chunk_rows
from kgforge.sources.pages import movies_ontology


def _py_chunk_oracle(rows, k):
    """Pure-python mirror of csv.py:15-32 semantics (floor drop)."""
    n = len(rows) // k
    return ["\n".join(rows[i * k : (i + 1) * k]) for i in range(n)]


def test_chunk_rows_floor_drop(spark):
    rows = [f"line{i:03d}" for i in range(125)]  # 125 rows, k=50 -> 2 docs
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "idx long, txt string"
    )
    got = {
        r["chunk_id"]: r["content"]
        for r in chunk_rows(df, "txt", "idx", 50).collect()
    }
    want = _py_chunk_oracle(rows, 50)
    assert len(got) == 2  # remainder of 25 dropped (csv.py:20)
    assert got[0] == want[0]
    assert got[1] == want[1]


def test_chunk_csv_cell_join(spark):
    df = spark.createDataFrame(
        [(i, f"a{i}", f"b{i}") for i in range(4)], "idx long, c1 string, c2 string"
    )
    out = chunk_csv(df, "idx", rows_per_document=2).collect()
    contents = {r["chunk_id"]: r["content"] for r in out}
    assert contents[0] == "a0,b0\na1,b1"
    assert contents[1] == "a2,b2\na3,b3"


def test_chunk_jsonl_trailing_newlines(spark):
    # readlines keeps "\n" per line; join adds another (jsonl.py:20-27)
    df = spark.createDataFrame(
        [(i, f'{{"k":{i}}}') for i in range(2)], "idx long, line string"
    )
    out = chunk_jsonl(df, "line", "idx", rows_per_document=2).collect()
    assert out[0]["content"] == '{"k":0}\n\n{"k":1}\n'


def test_chunk_partitioned(spark):
    df = spark.createDataFrame(
        [(f, i, f"r{f}{i}") for f in ("x", "y") for i in range(3)],
        "file string, idx long, txt string",
    )
    out = chunk_rows(df, "txt", "idx", 2, part_col="file").collect()
    by_file = {(r["file"], r["chunk_id"]): r["content"] for r in out}
    assert by_file[("x", 0)] == "rx0\nrx1"
    assert by_file[("y", 0)] == "ry0\nry1"
    assert len(by_file) == 2  # remainders dropped per file


def test_sanitize_edges(spark):
    df = spark.createDataFrame(
        [("u", None, "acted-in!", "Per son", "k1", "Mo vie", "k2", None)],
        "url string, warc_ts timestamp, label string, src_label string, "
        "src_key string, dst_label string, dst_key string, "
        "attributes map<string,string>",
    )
    r = normalize.sanitize_edges(df).collect()[0]
    assert r["label"] == "ACTEDIN"
    assert r["src_label"] == "Person"
    assert r["dst_label"] == "Movie"


def test_ontology_membership_filter(spark):
    onto = movies_ontology()
    mentions = spark.createDataFrame(
        [
            ("u", None, "Person", "A", None),
            ("u", None, "Alien", "B", None),
        ],
        "url string, warc_ts timestamp, label string, key string, "
        "attributes map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("u", None, "DIRECTED", "Person", "A", "Movie", "M", None),
            ("u", None, "DIRECTED", "Movie", "M", "Person", "A", None),  # J6: wrong direction
            ("u", None, "UNKNOWN", "Person", "A", "Movie", "M", None),   # P7
        ],
        "url string, warc_ts timestamp, label string, src_label string, "
        "src_key string, dst_label string, dst_key string, "
        "attributes map<string,string>",
    )
    m_ok, e_ok = normalize.filter_to_ontology(mentions, edges, onto, spark)
    assert [r["label"] for r in m_ok.collect()] == ["Person"]
    kept = e_ok.collect()
    assert len(kept) == 1
    assert kept[0]["src_label"] == "Person"


def test_validate_attributes_quarantine(spark):
    onto = movies_ontology()
    mentions = spark.createDataFrame(
        [
            ("u", None, "Movie", "M1", {"title": "M1", "release_year": "1999"}),
            ("u", None, "Movie", "M2", {"title": "M2", "release_year": "abc"}),
        ],
        "url string, warc_ts timestamp, label string, key string, "
        "attributes map<string,string>",
    )
    valid, quarantine = normalize.validate_attributes(mentions, onto)
    assert [r["key"] for r in valid.collect()] == ["M1"]
    assert [r["key"] for r in quarantine.collect()] == ["M2"]


def test_missing_required_attr_kept_by_default(spark):
    """Reference parity: the extraction path writes records missing a
    required (non-unique) attribute — only manual add_node enforces
    `required`. Strict curation mode is opt-in."""
    from kgforge.ontology import Attribute, Entity, Ontology

    onto = Ontology(
        entities=[
            Entity("Stats", [
                Attribute("name", "string", True, True),
                Attribute("passes", "number", False, True),
            ]),
        ],
        relations=[],
    )
    mentions = spark.createDataFrame(
        [
            ("u", None, "Stats", "A", {"name": "A", "passes": "3"}),
            ("u", None, "Stats", "B", {"name": "B"}),  # passes missing
        ],
        "url string, warc_ts timestamp, label string, key string, "
        "attributes map<string,string>",
    )
    valid, quar = normalize.validate_attributes(mentions, onto)
    assert sorted(r["key"] for r in valid.collect()) == ["A", "B"]
    assert quar.count() == 0
    strict_valid, strict_quar = normalize.validate_attributes(
        mentions, onto, enforce_required=True
    )
    assert [r["key"] for r in strict_valid.collect()] == ["A"]
    assert [r["key"] for r in strict_quar.collect()] == ["B"]
