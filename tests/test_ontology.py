"""M1: ontology schema parity with the reference JSON format + rules."""

import json

import pytest

from pyspark.sql import functions as F

from kgforge.ontology import Attribute, Entity, Ontology, Relation


def _ref(path):
    with open(f"/root/reference/{path}") as f:
        return json.load(f)


@pytest.mark.parametrize(
    "path",
    ["examples/movies/ontology.json", "examples/ufc/ontology.json"],
)
def test_reference_ontology_roundtrip(path):
    """Golden reference ontologies load and round-trip structurally."""
    raw = _ref(path)
    onto = Ontology.from_json(raw)
    assert len(onto.entities) == len(raw["entities"])
    assert len(onto.relations) == len(raw["relations"])
    again = Ontology.from_json(onto.to_json())
    assert again.to_json() == onto.to_json()
    # labels in the goldens are already sanitized — loading must not alter them
    assert [e.label for e in onto.entities] == [
        e["label"] for e in raw["entities"]
    ]
    assert [r.label for r in onto.relations] == [
        r["label"] for r in raw["relations"]
    ]


def test_sanitize_rules():
    # entity.py:39 — strip
    assert Entity("My Label!", []).label == "MyLabel"
    # relation.py:125 — upper + strip
    assert Relation("acted-in", "A", "B").label == "ACTEDIN"
    assert Relation("acted_in", "A", "B").label == "ACTED_IN"
    # attribute.py:68 — non-alnum -> _
    assert Attribute("first name", "string").name == "first_name"


def test_attribute_codec():
    # attribute.py:94-127 — "name:type!*"
    a = Attribute.from_string("name:string!*")
    assert (a.name, a.type, a.unique, a.required) == ("name", "string", True, True)
    b = Attribute.from_string("age:number")
    assert (b.type, b.unique, b.required) == ("number", False, False)
    assert str(a) == 'name: "string!*"'
    with pytest.raises(Exception):
        Attribute.from_string("x:date")


def test_merge_with_attribute_union():
    # ontology.py:134-166 + entity.py:102-122
    a = Ontology(
        [Entity("P", [Attribute("name", "string", True)])],
        [Relation("KNOWS", "P", "P")],
    )
    b = Ontology(
        [Entity("P", [Attribute("age", "number", False)]), Entity("Q", [])],
        [Relation("LIKES", "P", "Q")],
    )
    a.merge_with(b)
    p = a.get_entity("P")
    assert {at.name for at in p.attributes} == {"name", "age"}
    assert a.has_entity("Q")
    assert {r.label for r in a.relations} == {"KNOWS", "LIKES"}


def test_discard_orphans():
    # ontology.py:168-227
    o = Ontology(
        [Entity("A", []), Entity("B", []), Entity("Lonely", [])],
        [Relation("R", "A", "B"), Relation("BAD", "A", "Ghost")],
    )
    o.discard_relations_without_entities()
    assert {r.label for r in o.relations} == {"R"}
    o.discard_entities_without_relations()
    assert {e.label for e in o.entities} == {"A", "B"}


def test_validate_entities():
    # ontology.py:229-253
    ok = Ontology([Entity("A", [Attribute("id", "string", True)])], [])
    bad = Ontology([Entity("A", [Attribute("id", "string", False)])], [])
    assert ok.validate_entities() is True
    assert bad.validate_entities() is False


def test_compile_shape():
    from kgforge.sources.pages import movies_ontology

    c = movies_ontology().compile()
    assert c["entities"]["Person"]["unique"] == ["name"]
    assert c["entities"]["Movie"]["attrs"]["release_year"] == "number"
    sigs = c["relations"]["ACTED_IN"]
    assert sigs[0][0] == "Person" and sigs[0][1] == "Movie"


def test_to_dataframes(spark):
    from kgforge.sources.pages import movies_ontology

    ents, rels = movies_ontology().to_dataframes(spark)
    assert ents.count() == 3
    assert {r["label"] for r in rels.collect()} == {
        "DIRECTED",
        "ACTED_IN",
        "HAS_GENRE",
    }


def test_ontology_from_graph_composite_key_roundtrips(spark):
    """Labels with a composite (multi-attribute) node key: no single
    attribute mirrors the pipe-joined key, so a fallback unique key is
    synthesized and the recovered ontology passes validate_entities
    (ADVICE r01: it used to come back keyless and be rejected)."""
    from kgforge.ontology import ontology_from_graph

    nodes = spark.createDataFrame(
        [
            (1, "Flight", "AA|2024-01-01",
             {"airline": "AA", "day": "2024-01-01"}),
            (2, "Flight", "BB|2024-01-02",
             {"airline": "BB", "day": "2024-01-02"}),
        ],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = nodes.limit(0).select(
        F.col("label"),
        F.col("label").alias("src_label"), F.col("label").alias("dst_label"),
    )
    onto = ontology_from_graph(nodes, edges)
    assert onto.validate_entities()
    flight = onto.get_entity("Flight")
    assert len(flight.unique_attributes()) == 1


def test_ontology_from_graph_single_unique_key(spark):
    """When several attributes all mirror the key, only the first becomes
    unique — two unique attrs would change the node-key convention on the
    next materialization."""
    from kgforge.ontology import ontology_from_graph

    nodes = spark.createDataFrame(
        [
            (1, "City", "Paris", {"name": "Paris", "display": "Paris"}),
            (2, "City", "Lyon", {"name": "Lyon", "display": "Lyon"}),
        ],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = nodes.limit(0).select(
        F.col("label"),
        F.col("label").alias("src_label"), F.col("label").alias("dst_label"),
    )
    onto = ontology_from_graph(nodes, edges)
    city = onto.get_entity("City")
    assert [a.name for a in city.unique_attributes()] == ["display"]
    assert {a.name for a in city.attributes} == {"name", "display"}
