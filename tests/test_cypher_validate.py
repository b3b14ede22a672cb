"""F5 parity: Cypher-text validation vs the reference's unit suite
(ref tests/test_helper_validate_cypher.py — scenario classes: valid query,
wrong direction, comma-separated multi-pattern; plus the multi-hop and
undirected-leg behaviors of helpers.validate_cypher_relation_directions)."""

from __future__ import annotations

from kgforge.ontology import Entity, Ontology, Relation
from kgforge.plans.cypher_validate import (
    validate_cypher,
    validate_cypher_entities_exist,
    validate_cypher_relation_directions,
    validate_cypher_relations_exist,
)


def _fight_onto():
    return Ontology(
        entities=[Entity("Fighter", []), Entity("Fight", [])],
        relations=[Relation("FOUGHT_IN", "Fighter", "Fight", [])],
    )


def test_valid_query_passes():
    """Reference TestValidateCypher1: valid query -> all checks clean."""
    cypher = """
    MATCH (f:Fighter)-[r:FOUGHT_IN]->(fight:Fight)
    RETURN f, count(fight) AS fight_count
    ORDER BY fight_count DESC
    LIMIT 1"""
    onto = _fight_onto()
    assert validate_cypher_entities_exist(cypher, onto) == []
    assert validate_cypher_relations_exist(cypher, onto) == []
    assert validate_cypher_relation_directions(cypher, onto) == []
    assert validate_cypher(cypher, onto) is None


def test_wrong_direction_fails():
    """Reference TestValidateCypher2: reversed arrow -> exactly one
    direction error, entity/relation existence still clean."""
    cypher = """
    MATCH (f:Fighter)<-[r:FOUGHT_IN]-(fight:Fight)
    RETURN f"""
    onto = _fight_onto()
    assert validate_cypher_entities_exist(cypher, onto) == []
    assert validate_cypher_relations_exist(cypher, onto) == []
    errors = validate_cypher_relation_directions(cypher, onto)
    assert len(errors) == 1
    assert validate_cypher(cypher, onto) is not None


def test_comma_separated_patterns_pass():
    """Reference TestValidateCypher3: two comma-separated patterns, both
    correctly directed -> clean (the comma resets the left context; without
    that, ALLOWS would see Pet as its source)."""
    cypher = """
    MATCH (a:Airline)-[:ACCEPTS]->(p:Pet), (r:Route)-[:ALLOWS]->(sd:Service_Dog)
    RETURN a, p, r, sd
    """
    onto = Ontology(
        entities=[
            Entity("Airline", []), Entity("Pet", []),
            Entity("Route", []), Entity("Service_Dog", []),
        ],
        relations=[
            Relation("ACCEPTS", "Airline", "Pet", []),
            Relation("ALLOWS", "Route", "Service_Dog", []),
        ],
    )
    assert validate_cypher_entities_exist(cypher, onto) == []
    assert validate_cypher_relations_exist(cypher, onto) == []
    assert validate_cypher_relation_directions(cypher, onto) == []
    assert validate_cypher(cypher, onto) is None


def test_multi_hop_each_leg_checked():
    """Multi-hop chain: each leg resolves against its neighboring nodes;
    a reversed middle leg is caught, correct legs are not."""
    onto = Ontology(
        entities=[Entity("A", []), Entity("B", []), Entity("C", [])],
        relations=[
            Relation("R1", "A", "B", []),
            Relation("R2", "B", "C", []),
        ],
    )
    ok = "MATCH (a:A)-[:R1]->(b:B)-[:R2]->(c:C) RETURN a"
    assert validate_cypher(ok, onto) is None
    bad = "MATCH (a:A)-[:R1]->(b:B)<-[:R2]-(c:C) RETURN a"
    errors = validate_cypher_relation_directions(bad, onto)
    assert len(errors) == 1 and "R2" in errors[0]


def test_undirected_legs_skipped():
    """Undirected `-[]-` legs carry no direction claim -> never an error."""
    onto = _fight_onto()
    cypher = "MATCH (f:Fighter)-[r:FOUGHT_IN]-(fight:Fight) RETURN f"
    assert validate_cypher_relation_directions(cypher, onto) == []
    assert validate_cypher(cypher, onto) is None


def test_unknown_labels_reported():
    onto = _fight_onto()
    assert validate_cypher_entities_exist("MATCH (:Referee) RETURN 1", onto) \
        == ["Entity Referee not found in ontology"]
    assert validate_cypher_relations_exist("MATCH ()-[:JUDGED]->() RETURN 1",
                                           onto) \
        == ["Relation JUDGED not found in ontology"]
    # named-relation unknown label surfaces through the direction check
    errors = validate_cypher_relation_directions(
        "MATCH (f:Fighter)-[x:JUDGED]->(fight:Fight) RETURN f", onto
    )
    assert errors == ["Relation JUDGED not found in ontology"]


def test_empty_statement():
    assert validate_cypher("", _fight_onto()) == ["Cypher statement is empty"]


def test_validate_cypher_udf(spark):
    """Distributed audit surface: column of cypher strings -> error arrays."""
    from pyspark.sql import functions as F

    from kgforge.plans.cypher_validate import validate_cypher_udf

    onto = _fight_onto()
    df = spark.createDataFrame(
        [
            (1, "MATCH (f:Fighter)-[r:FOUGHT_IN]->(fight:Fight) RETURN f"),
            (2, "MATCH (f:Fighter)<-[r:FOUGHT_IN]-(fight:Fight) RETURN f"),
            (3, "MATCH (:Referee) RETURN 1"),
        ],
        "id int, cypher string",
    )
    out = (
        df.withColumn("errors", validate_cypher_udf(onto)(F.col("cypher")))
        .select("id", F.size("errors").alias("n_errors"))
        .collect()
    )
    by_id = {r.id: r.n_errors for r in out}
    assert by_id == {1: 0, 2: 1, 3: 1}


def test_call_reltypes_checked_against_ontology():
    """A typo'd relTypes label in CALL algo.SPpaths fails validation
    instead of silently returning zero rows."""
    from kgforge.ontology import Attribute, Entity, Ontology, Relation
    from kgforge.plans.cypher_validate import validate_cypher

    onto = Ontology(
        entities=[Entity("City", [Attribute("name", "string", True, True)])],
        relations=[Relation("ROAD", "City", "City", [])],
    )
    good = (
        "MATCH (a:City), (b:City) CALL algo.SPpaths({sourceNode: a, "
        "targetNode: b, relTypes: ['ROAD'], weightProp: 'w'}) "
        "YIELD pathWeight RETURN pathWeight"
    )
    assert validate_cypher(good, onto) is None
    bad = good.replace("'ROAD'", "'RAOD'")
    errs = validate_cypher(bad, onto)
    assert errs and any("RAOD" in e for e in errs)
