"""Direct parity against the reference's own fixture artifacts (read-only):
golden ontology JSONs round-trip through our codec, and the madoff.txt E2E
corpus flows through the loader + extraction pipeline."""

from __future__ import annotations

import json
import os

import pytest

from kgforge.ontology import Ontology

MOVIES = "/root/reference/examples/movies/ontology.json"
UFC = "/root/reference/examples/ufc/ontology.json"
MADOFF = "/root/reference/tests/data/madoff.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MOVIES), reason="reference fixtures unavailable"
)


def test_movies_golden_ontology_roundtrip():
    raw = json.load(open(MOVIES))
    onto = Ontology.from_json(raw)
    assert {e.label for e in onto.entities} == {
        "Movie", "Person", "Review", "Character", "Genre"
    }
    assert {r.label for r in onto.relations} == {
        "DIRECTED", "PRODUCED", "ACTED_IN", "WROTE", "PLAYED",
        "HAS_GENRE", "BELONGS_TO", "HAS", "CREATED",
    }
    movie = onto.get_entity("Movie")
    uniq = movie.unique_attributes()
    assert [a.name for a in uniq] == ["title"]
    assert {a.name: a.type for a in movie.attributes}["release_year"] == "number"
    # to_json -> from_json closes the loop with identical labels/flags
    again = Ontology.from_json(onto.to_json())
    assert again.to_json() == onto.to_json()


def test_ufc_golden_ontology_roundtrip():
    onto = Ontology.from_json(json.load(open(UFC)))
    assert {e.label for e in onto.entities} == {
        "Event", "Fight", "Fighter", "FightStatistics"
    }
    rels = {(r.label, r.source, r.target) for r in onto.relations}
    assert ("PART_OF", "Fight", "Event") in rels
    ev = onto.get_entity("Event")
    assert [a.name for a in ev.required_attributes()] == [
        "title", "date", "location"
    ]
    # compile target used by the extraction UDFs
    compiled = onto.compile()
    assert compiled["entities"]["Event"]["unique"] == ["title"]


def test_madoff_corpus_flows_through_pipeline(spark):
    """The reference's only asserted E2E corpus: loads via our text loader,
    extracts with a person-typed ontology, produces no crash and only
    ontology-constrained labels."""
    from kgforge.operators import extract, normalize
    from kgforge.ontology import Attribute, Entity, Relation
    from kgforge.sources.loaders import load_source
    from pyspark.sql import functions as F

    onto = Ontology(
        entities=[
            Entity("Actor", [Attribute("name", "string", True, True)]),
            Entity("Movie", [Attribute("title", "string", True, True)]),
        ],
        relations=[
            Relation("ACTED_IN", "Actor", "Movie", [Attribute("role", "string")]),
        ],
    )
    docs = load_source(spark, MADOFF)
    pages = docs.select(
        F.lit("file://madoff").alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.col("content").alias("text"),
    )
    rules = extract.compile_rules(onto)
    ir = extract.extract_ir(pages, rules, keep_cols=["url", "warc_ts"])
    mentions, raw_edges = extract.explode_ir(ir)
    mentions = normalize.sanitize_mentions(mentions)
    raw_edges = normalize.sanitize_edges(raw_edges)
    mentions, raw_edges = normalize.filter_to_ontology(
        mentions, raw_edges, onto, spark
    )
    labels = {r.label for r in mentions.select("label").distinct().collect()}
    assert labels <= {"Actor", "Movie"}
    # "Joseph Scotto" is the reference's golden substring
    # (tests/test_kg_openai.py:90) — the raw text must reach extraction
    assert docs.filter(F.col("content").contains("Joseph Scotto")).count() == 1
