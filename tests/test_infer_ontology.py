"""EP2: deterministic ontology inference from documents."""

from __future__ import annotations

from kgforge.operators.infer_ontology import (
    fix_ontology,
    infer_partial,
    ontology_from_pages,
)
from kgforge.ontology import Attribute, Entity, Ontology, Relation


def test_infer_partial_single_doc():
    text = (
        "Alan Abbott is a Person.\n"
        "The Dark Tide is a Movie.\n"
        "Alan Abbott directed The Dark Tide.\n"
        "The release year of The Dark Tide is 1984.\n"
        "The Dark Tide was directed by Alan Abbott.\n"
    )
    part = infer_partial(text)
    labels = {e["label"] for e in part["entities"]}
    assert labels == {"Movie", "Person"}
    movie = next(e for e in part["entities"] if e["label"] == "Movie")
    assert {"name": "release_year", "type": "number", "unique": False,
            "required": False} in movie["attributes"]
    rels = {(r["label"], r["source"]["label"], r["target"]["label"])
            for r in part["relations"]}
    assert rels == {("DIRECTED", "Person", "Movie")}


def test_fix_ontology_drops_orphans_and_promotes_unique():
    onto = Ontology(
        entities=[
            Entity("Person", [Attribute("name", "string")]),
            Entity("Movie", [Attribute("title", "string")]),
            Entity("Orphan", []),
        ],
        relations=[
            Relation("DIRECTED", "Person", "Movie"),
            Relation("KNOWS", "Person", "Ghost"),  # missing endpoint
        ],
    )
    fixed = fix_ontology(onto)
    assert {e.label for e in fixed.entities} == {"Person", "Movie"}
    assert {r.label for r in fixed.relations} == {"DIRECTED"}
    assert fixed.validate_entities()  # every entity now has a unique attr


def test_ontology_from_pages_recovers_movies_schema(spark):
    from kgforge.sources.pages import corpus_to_spark, generate_corpus

    corpus = generate_corpus(n_pages=60, seed=42, type_all_entities=True)
    pages, _, _ = corpus_to_spark(spark, corpus)
    onto = ontology_from_pages(pages)
    labels = {e.label for e in onto.entities}
    assert {"Person", "Movie", "Genre"} <= labels
    rels = {(r.label, r.source, r.target) for r in onto.relations}
    assert ("DIRECTED", "Person", "Movie") in rels
    assert ("ACTED_IN", "Person", "Movie") in rels
    assert ("HAS_GENRE", "Movie", "Genre") in rels
    movie = onto.get_entity("Movie")
    assert any(
        a.name == "release_year" and a.type == "number" for a in movie.attributes
    )
    assert onto.validate_entities()
