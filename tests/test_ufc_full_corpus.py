"""Full reference-corpus end-to-end: ALL 767 UFC fixture pages through the
staged production pipeline (KnowledgeGraph.process_pages + layout wrappers)
under the reference's shipped ontology. The 8-page gold gate pins exact
values (test_fixture_gold); this run pins corpus-level structure — the
"switch from the reference" scenario: same input files, same ontology,
full graph out."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kgforge import fixtures as FX

pytestmark = pytest.mark.skipif(
    not FX.reference_available(), reason="reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def ufc_graph(spark, tmp_path_factory):
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Ontology

    onto = Ontology.from_json(json.loads(FX.UFC_ONTOLOGY_JSON.read_text()))
    files = sorted(FX.UFC_DIR.glob("*.html"))
    rows = [
        (f"https://sports-statistics.com/{f.name}", bytearray(f.read_bytes()))
        for f in files
    ]
    pages = spark.createDataFrame(rows, "url string, html binary").select(
        "url",
        F.to_timestamp(F.lit("2024-10-22 00:00:00")).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    out_dir = str(tmp_path_factory.mktemp("ufc_kg"))
    kg = KnowledgeGraph(spark, onto, out_dir)
    out = kg.process_pages(pages, wrappers=["ufc_fight_stats"])
    return {"kg": kg, "out": out, "n_files": len(files)}


def test_corpus_level_counts(ufc_graph):
    kg = ufc_graph["kg"]
    nodes = kg.nodes().persist()
    by_label = {
        r["label"]: r["n"]
        for r in nodes.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    # 767 files, 22 empty placeholders -> 745 real fight pages; rematches
    # share a fight title (unique attr => one node), so Fight <= 745
    assert 700 <= by_label["Fight"] <= 745
    # the corpus spans ~60 events
    assert 50 <= by_label["Event"] <= 70
    # two fighters per fight, heavily shared across pages
    assert 500 <= by_label["Fighter"] <= 1200
    assert by_label["FightStatistics"] <= by_label["Fighter"] + 50


def test_every_event_has_date_and_location(ufc_graph):
    nodes = ufc_graph["kg"].nodes()
    events = nodes.filter(F.col("label") == "Event")
    missing = events.filter(
        F.col("props")["date"].isNull() | F.col("props")["location"].isNull()
    ).count()
    assert missing == 0
    bad_date = events.filter(
        ~F.col("props")["date"].rlike(r"^\d{4}-\d{2}-\d{2}$")
    ).count()
    assert bad_date == 0


def test_gold_page_relations_present_in_full_graph(ufc_graph):
    """The hand-verified title-bout page's 7 relations survive the full
    corpus run (linking/CC must not have mangled them)."""
    triples = ufc_graph["out"]["triples"]
    gold = FX.load_gold("ufc")[0]
    keys = {r["src_key"] for r in gold["relations"]} | {
        r["dst_key"] for r in gold["relations"]
    }
    got = {
        (r.subj_label, r.subj_key, r.pred, r.obj_label, r.obj_key)
        for r in triples.filter(
            F.col("subj_key").isin(*keys) & F.col("obj_key").isin(*keys)
        ).collect()
    }
    for r in gold["relations"]:
        assert (
            r["src_label"], r["src_key"], r["label"], r["dst_label"],
            r["dst_key"],
        ) in got


def test_edges_resolve_to_existing_nodes(ufc_graph):
    kg = ufc_graph["kg"]
    edges, nodes = kg.edges(), kg.nodes()
    n_ids = nodes.select(F.col("node_id").alias("src_id"))
    dangling = edges.join(n_ids, on="src_id", how="left_anti").count()
    assert dangling == 0
    n_ids2 = nodes.select(F.col("node_id").alias("dst_id"))
    assert edges.join(n_ids2, on="dst_id", how="left_anti").count() == 0


def test_part_of_connects_fights_to_events(ufc_graph):
    m = ufc_graph["kg"].match("Fight", "PART_OF", "Event")
    n = m.count()
    assert n >= 700  # every real page contributes its fight->event edge


def test_wrapper_pipeline_resumes_after_crash(spark, tmp_path, monkeypatch):
    """Crash-resume with wrappers enabled: stage 01 carries the html
    column, and the resumed run must produce the same graph as a straight
    run (the html binary survives the stage parquet round-trip)."""
    import json

    from kgforge.ontology import Ontology
    from kgforge.plans.pipeline import run_pipeline

    onto = Ontology.from_json(json.loads(FX.UFC_ONTOLOGY_JSON.read_text()))
    gold_pages = [d["url"] for d in FX.load_gold("ufc")]
    rows = [
        (f"https://sports-statistics.com/{n}",
         bytearray((FX.UFC_DIR / n).read_bytes()))
        for n in gold_pages
    ]
    pages = spark.createDataFrame(rows, "url string, html binary").select(
        "url",
        F.to_timestamp(F.lit("2024-10-22 00:00:00")).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    out_dir = str(tmp_path / "kg")
    monkeypatch.setenv("KGFORGE_FAIL_AFTER_STAGE", "02_ir")
    with pytest.raises(RuntimeError):
        run_pipeline(spark, pages, onto, out_dir,
                     wrappers=["ufc_fight_stats"])
    monkeypatch.delenv("KGFORGE_FAIL_AFTER_STAGE")
    out = run_pipeline(spark, pages, onto, out_dir,
                       wrappers=["ufc_fight_stats"])
    KEY = ["subj_label", "subj_key", "pred", "obj_label", "obj_key"]
    resumed = {tuple(r) for r in out["triples"].select(*KEY).collect()}

    out2 = run_pipeline(spark, pages, onto, str(tmp_path / "kg2"),
                        wrappers=["ufc_fight_stats"])
    straight = {tuple(r) for r in out2["triples"].select(*KEY).collect()}
    assert resumed == straight and len(resumed) >= 8 * 7
