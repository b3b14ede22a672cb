"""North-rule P/R gate: emitted triples vs hand-derived gold from the
reference's OWN fixtures (not a self-generated corpus).

Gold provenance: tools/derive_fixture_gold.py parsed the raw fixture files
with an independent code path (flat regex over raw HTML vs the production
DOM parser), its output was reviewed by hand against the files, then frozen
as kgforge/fixtures/gold_*.json. These tests compare the PRODUCTION
extraction path against that frozen gold and assert the north rule's
P/R >= 0.95 — on the reference's corpora, per-kind and per-corpus.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from kgforge import fixtures as FX

pytestmark = pytest.mark.skipif(
    not FX.reference_available(), reason="reference fixtures unavailable"
)


def test_gold_files_are_nontrivial():
    """The frozen gold is the claim — sanity-check its shape so a truncated
    file can't silently weaken the gate."""
    madoff = FX.load_gold("madoff")
    assert len(madoff["relations"]) == 18  # full Top-cast block
    assert {r["label"] for r in madoff["relations"]} == {"ACTED_IN"}
    ufc = FX.load_gold("ufc")
    assert len(ufc) == 8
    methods = {
        e["attributes"]["method"]
        for doc in ufc
        for e in doc["entities"]
        if e["label"] == "Fight"
    }
    # every result-method template variant in the 767-page corpus
    assert methods == {
        "Decision - Unanimous", "Decision - Split", "Decision - Majority",
        "KO/TKO", "Submission", "TKO - Doctor's Stoppage", "DQ",
        "Could Not Continue",
    }
    for doc in ufc:
        assert sum(e["label"] == "FightStatistics" for e in doc["entities"]) == 2
        assert len(doc["relations"]) == 7
    poi = FX.load_gold("poi")
    assert [d["url"] for d in poi] == [
        "file://cities.json", "file://restaurants.json"
    ]
    assert sum(len(d["relations"]) for d in poi) == 20
    assert {r["label"] for d in poi for r in d["relations"]} == {
        "IN_COUNTRY", "IN_CITY"
    }
    # held-out generalization corpus (frozen r3): 10 cities + 20 attractions
    att = FX.load_gold("attractions")
    assert [d["url"] for d in att] == [
        "file://cities.json", "file://attractions.json"
    ]
    assert sum(len(d["relations"]) for d in att) == 30
    assert sum(
        e["label"] == "Attraction" for d in att for e in d["entities"]
    ) == 20
    assert {r["label"] for d in att for r in d["relations"]} == {
        "IN_COUNTRY", "IN_CITY"
    }


def test_ufc_wrapper_exact_on_title_bout():
    """Unit-level: DOM wrapper output is byte-identical to gold for the
    title-bout page (5 rounds, nickname on one side only)."""
    from kgforge.operators.wrappers import UfcFightStats

    doc = FX.load_gold("ufc")[0]
    raw = (FX.UFC_DIR / doc["url"]).read_text()
    w = UfcFightStats()
    assert w.matches(raw)
    ents, rels = w.extract(raw)
    assert {(l, k, tuple(sorted(a.items()))) for l, k, a in ents} == {
        (e["label"], e["key"], tuple(sorted(e["attributes"].items())))
        for e in doc["entities"]
    }
    assert {r[:5] for r in rels} == {
        (r["label"], r["src_label"], r["src_key"], r["dst_label"],
         r["dst_key"])
        for r in doc["relations"]
    }


def test_imdb_wrapper_exact_on_madoff():
    from kgforge.operators.wrappers import ImdbTitleCredits

    gold = FX.load_gold("madoff")
    text = FX.MADOFF_TXT.read_text()
    w = ImdbTitleCredits()
    assert w.matches(text)
    ents, rels = w.extract(text)
    assert {(l, k) for l, k, _ in ents} == {
        (e["label"], e["key"]) for e in gold["entities"]
    }
    # role attributes carried on the credit edges
    assert {(r[2], r[5]["role"]) for r in rels} == {
        (r["src_key"], r["attributes"]["role"]) for r in gold["relations"]
    }
    # the reference's own asserted substring (ref tests/test_kg_openai.py:90)
    assert ("Actor", "Joseph Scotto") in {(l, k) for l, k, _ in ents}


def test_fixture_pr_meets_north_rule(spark):
    """Full Spark production path (html->text, mapInPandas extraction with
    wrappers, sanitize, ontology filter) vs frozen gold: P/R >= 0.95 for
    every (corpus, kind), including the headline `relations` triples."""
    rows = FX.fixture_pr_report(spark).collect()
    assert len(rows) == 16  # 4 corpora x 4 kinds
    by_key = {(r["corpus"], r["kind"]): r for r in rows}
    for (corpus, kind), r in by_key.items():
        assert r["precision"] >= 0.95, (corpus, kind, r)
        assert r["recall"] >= 0.95, (corpus, kind, r)
    # the headline gate is non-vacuous
    assert by_key[("madoff", "relations")]["gold"] == 18
    assert by_key[("ufc", "relations")]["gold"] == 56
    assert by_key[("poi", "relations")]["gold"] == 20
    assert by_key[("attractions", "relations")]["gold"] == 30


def test_json_records_wrapper_scoping():
    """The two differently-bound JsonRecords wrappers each claim only the
    file whose records carry their fields (require_fields scoping)."""
    from kgforge.operators.wrappers import resolve_wrappers

    city_w, rest_w = resolve_wrappers(FX.POI_WRAPPERS)
    cities = (FX.REFERENCE_ROOT / "tests/data/cities.json").read_text()
    rests = (FX.REFERENCE_ROOT / "tests/data/restaurants.json").read_text()
    assert city_w.matches(cities) and not city_w.matches(rests)
    assert rest_w.matches(rests) and not rest_w.matches(cities)
    ents, rels = rest_w.extract(rests)
    assert ("Restaurant", "Trattoria da Enzo") in {(l, k) for l, k, _ in ents}
    assert ("IN_CITY", "Restaurant", "Trattoria da Enzo", "City", "Rome", {}) \
        in rels


def test_empty_placeholder_pages_flow_through(spark):
    """The 2 empty UFC placeholder files are dropped by the P1 filter, not
    crashed on, and contribute nothing."""
    mentions, _ = FX.extract_corpus_triples(spark, "ufc")
    urls = {r["url"] for r in mentions.select("url").distinct().collect()}
    assert not (urls & set(FX.UFC_EMPTY_PAGES))


def test_madoff_full_pipeline_matches_gold(spark, workdir):
    """madoff.txt through the COMPLETE staged pipeline (extraction +
    linking + CC + materialize): the final graph equals the gold exactly,
    role attributes included — linking must not merge any of the 18
    actors."""
    from pyspark.sql import functions as F

    from kgforge.kg import KnowledgeGraph

    pages = spark.createDataFrame(
        [("file://madoff", FX.MADOFF_TXT.read_text())],
        "url string, text string",
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-10-22 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )
    kg = KnowledgeGraph(spark, FX.madoff_ontology(), workdir)
    out = kg.process_pages(pages, wrappers=["imdb_title_credits"])
    gold = FX.load_gold("madoff")
    triples = {
        (r.subj_label, r.subj_key, r.pred, r.obj_label, r.obj_key)
        for r in out["triples"].collect()
    }
    assert triples == {
        (r["src_label"], r["src_key"], r["label"], r["dst_label"],
         r["dst_key"])
        for r in gold["relations"]
    }
    # roles survive edge materialization
    roles = {
        (r.src_key, r.props.get("role"))
        for r in kg.edges().collect()
    }
    assert roles == {
        (r["src_key"], r["attributes"]["role"]) for r in gold["relations"]
    }
