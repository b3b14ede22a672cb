"""Graph query surface (EP3) + FalkorDB export + ontology reverse-engineering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.ontology import ontology_from_graph
from kgforge.plans.graph_query import bfs_distances, k_hop, match_edges, symmetrize
from kgforge.plans.pipeline import build_graph
from kgforge.sinks.falkordb_export import (
    edge_statements,
    export_cypher,
    node_statements,
)
from kgforge.sources.pages import corpus_to_spark, generate_corpus, movies_ontology


@pytest.fixture(scope="module")
def graph(spark):
    corpus = generate_corpus(n_pages=40, seed=42)
    pages, _, _ = corpus_to_spark(spark, corpus)
    out = build_graph(spark, pages, movies_ontology())
    out["nodes"] = out["nodes"].persist()
    out["edges"] = out["edges"].persist()
    return out


def test_bfs_matches_networkx_style_oracle(spark):
    """Hand-built graph: two components + a cycle; dists must be exact."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (3, 5), (10, 11)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "id long")
    got = {
        (r.id, r.dist)
        for r in bfs_distances(symmetrize(edges), src, max_depth=5).collect()
    }
    assert got == {(1, 0), (2, 1), (4, 1), (3, 2), (5, 3)}


def test_k_hop_exact_ring(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    src = spark.createDataFrame([(0,)], "id long")
    exactly2 = {r.id for r in k_hop(symmetrize(edges), src, 2, exactly=True).collect()}
    assert exactly2 == {2}


def test_match_pattern_labels(graph):
    out = match_edges(graph["nodes"], graph["edges"], "Person", "DIRECTED", "Movie")
    rows = out.collect()
    assert rows and all(r.rel == "DIRECTED" for r in rows)
    # every directed pair exists in the triples view too
    trip = {
        (t.subj_key, t.obj_key)
        for t in graph["triples"].filter(F.col("pred") == "DIRECTED").collect()
    }
    assert {(r.src_key, r.dst_key) for r in rows} == trip


def test_cypher_statement_shape(graph):
    keys = {"Person": "name", "Movie": "title", "Genre": "name"}
    stmts = node_statements(graph["nodes"], keys).collect()
    by_stmt = {s.stmt for s in stmts}
    assert all(s.startswith("MERGE (n:") and ") SET n += {" in s for s in by_stmt)
    person = next(s for s in by_stmt if s.startswith("MERGE (n:Person"))
    assert '{name: "' in person

    edges = edge_statements(graph["edges"], keys).collect()
    assert all(
        e.stmt.startswith("MATCH (s:") and "MERGE (s)-[r:" in e.stmt for e in edges
    )


def test_cypher_escaping(spark):
    nodes = spark.createDataFrame(
        [(1, "Person", 'Joe "Q" Smith', {"name": 'Joe "Q" Smith', "note": None})],
        "node_id long, label string, key string, props map<string,string>",
    )
    stmt = node_statements(nodes, {"Person": "name"}).first().stmt
    assert '\\"Q\\"' in stmt  # helpers.py:38-41 unescaped-quote escaping
    assert 'note: ""' in stmt  # None -> "" (helpers.py:44-46)


def test_export_roundtrip_files(graph, workdir, spark):
    keys = {"Person": "name", "Movie": "title", "Genre": "name"}
    export_cypher(graph["nodes"], graph["edges"], keys, workdir)
    n = spark.read.text(f"{workdir}/nodes.cypher").count()
    e = spark.read.text(f"{workdir}/edges.cypher").count()
    assert n == graph["nodes"].count()
    assert e == graph["edges"].count()


def test_ontology_from_graph_roundtrip(graph):
    onto = ontology_from_graph(graph["nodes"], graph["edges"])
    labels = {e.label for e in onto.entities}
    assert labels == {"Person", "Movie", "Genre"}
    rels = {(r.label, r.source, r.target) for r in onto.relations}
    assert ("DIRECTED", "Person", "Movie") in rels
    assert ("HAS_GENRE", "Movie", "Genre") in rels
    movie = onto.get_entity("Movie")
    attrs = {a.name: a.type for a in movie.attributes}
    assert attrs.get("release_year") == "number"
    assert attrs.get("title") == "string"
    # unique/key attribute recovered from key == value invariant
    assert any(a.name == "title" and a.unique for a in movie.attributes)
