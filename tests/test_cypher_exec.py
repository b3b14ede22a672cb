"""Cypher-subset executor: the reference's documented query shapes
(ref fixtures/prompts.py:366-406 examples; tests/test_kg.py queries)
compiled to DataFrame plans over the graph tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.plans.cypher_exec import CypherUnsupported, run_cypher


@pytest.fixture(scope="module")
def graph(spark):
    """Fighters -> fights -> events, with props."""
    nodes = spark.createDataFrame(
        [
            (1, "Fighter", "Ana", {"name": "Ana", "wins": "12"}),
            (2, "Fighter", "Bo", {"name": "Bo", "wins": "7"}),
            (3, "Fighter", "Cy", {"name": "Cy", "wins": "3"}),
            (10, "Fight", "Ana v Bo", {"title": "Ana v Bo", "rounds": "3"}),
            (11, "Fight", "Bo v Cy", {"title": "Bo v Cy", "rounds": "5"}),
            (20, "Event", "Open 1", {"title": "Open 1", "city": "Rio"}),
        ],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            (1, "FOUGHT_IN", 10), (2, "FOUGHT_IN", 10),
            (2, "FOUGHT_IN", 11), (3, "FOUGHT_IN", 11),
            (10, "PART_OF", 20), (11, "PART_OF", 20),
        ],
        "src_id bigint, label string, dst_id bigint",
    ).withColumn(
        "props", F.create_map().cast("map<string,string>")
    )
    return nodes.cache(), edges.cache()


def test_reference_test_query_top_fighter(graph):
    """The exact query shape of ref tests/test_helper_validate_cypher.py /
    test_kg.py: top fighter by fight count."""
    nodes, edges = graph
    out = run_cypher(
        """
        MATCH (f:Fighter)-[r:FOUGHT_IN]->(fight:Fight)
        RETURN f, count(fight) AS fight_count
        ORDER BY fight_count DESC, f ASC
        LIMIT 1
        """,
        nodes, edges,
    ).collect()
    assert [(r.f, r.fight_count) for r in out] == [("Bo", 2)]


def test_multi_hop_chain(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight)-[:PART_OF]->(e:Event) "
        "RETURN DISTINCT f, e ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.e) for r in out] == [
        ("Ana", "Open 1"), ("Bo", "Open 1"), ("Cy", "Open 1"),
    ]


def test_where_numeric_and_string(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WHERE f.wins >= 7 AND x.title CONTAINS 'Bo' "
        "RETURN f.name AS name, x.title AS title ORDER BY name, title",
        nodes, edges,
    ).collect()
    assert [(r.name, r.title) for r in out] == [
        ("Ana", "Ana v Bo"), ("Bo", "Ana v Bo"), ("Bo", "Bo v Cy"),
    ]


def test_reversed_arrow(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (x:Fight)<-[:FOUGHT_IN]-(f:Fighter {name: 'Cy'}) RETURN x",
        nodes, edges,
    ).collect()
    assert [r.x for r in out] == ["Bo v Cy"]


def test_comma_patterns_shared_var(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight), (x)-[:PART_OF]->(e:Event) "
        "RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert out[0].n == 4


def test_count_distinct_and_star(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN count(DISTINCT f) AS nf, count(*) AS n",
        nodes, edges,
    ).collect()
    assert (out[0].nf, out[0].n) == (3, 4)


def test_quoted_keywords_are_not_clauses(graph):
    """ADVICE r02: keywords / LIMIT digits inside string literals must not
    be parsed as clauses or split points."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (x:Fight) WHERE x.title = 'RETURN AND LIMIT 3' RETURN x",
        nodes, edges,
    ).collect()
    assert out == []
    out = run_cypher(
        "MATCH (x:Fight) WHERE x.title CONTAINS 'v Bo' AND x.title "
        "CONTAINS 'Ana AND' RETURN x",
        nodes, edges,
    ).collect()
    assert out == []
    out = run_cypher(
        "MATCH (x:Fight) WHERE x.title = 'Ana v Bo' RETURN x", nodes, edges
    ).collect()
    assert [r.x for r in out] == ["Ana v Bo"]


def test_var_length_reference_surface(graph):
    """-[:R*minHops..maxHops]-> from the reference's documented Cypher
    surface (ref fixtures/prompts.py:384) compiles to bounded frontier
    expansion."""
    nodes, edges = graph
    # 2 hops: Fighter -> Fight -> Event (mixed labels need no rel filter)
    out = run_cypher(
        "MATCH (f:Fighter)-[*2..2]->(e:Event) RETURN DISTINCT f, e ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.e) for r in out] == [
        ("Ana", "Open 1"), ("Bo", "Open 1"), ("Cy", "Open 1"),
    ]
    # *1..2 includes both the 1-hop Fight and the 2-hop Event
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'})-[*1..2]->(x) RETURN x ORDER BY x",
        nodes, edges,
    ).collect()
    assert [r.x for r in out] == ["Ana v Bo", "Open 1"]
    # label-filtered var-length leg
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN*1..3]->(x) RETURN DISTINCT x ORDER BY x",
        nodes, edges,
    ).collect()
    assert [r.x for r in out] == ["Ana v Bo", "Bo v Cy"]


def test_shortest_path_length(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH p = shortestPath((f:Fighter {name: 'Ana'})-[*..5]->(e:Event)) "
        "RETURN f, e, length(p) AS hops",
        nodes, edges,
    ).collect()
    assert [(r.f, r.e, r.hops) for r in out] == [("Ana", "Open 1", 2)]


def test_shortest_path_min_dist_on_diamond(spark):
    """Min distance wins when multiple walk lengths reach the target."""
    nodes = spark.createDataFrame(
        [(i, "N", f"n{i}", {}) for i in range(4)],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, "E", 1), (1, "E", 3), (0, "E", 3), (0, "E", 2), (2, "E", 3)],
        "src_id bigint, label string, dst_id bigint",
    ).withColumn("props", F.create_map().cast("map<string,string>"))
    out = run_cypher(
        "MATCH p = shortestPath((a:N {})-[:E*..4]->(b:N)) "
        "RETURN a, b, length(p) AS d ORDER BY a, b",
        nodes, edges,
    ).collect()
    got = {(r.a, r.b): r.d for r in out}
    assert got[("n0", "n3")] == 1  # direct edge beats the 2-hop walks
    assert got[("n0", "n1")] == 1 and got[("n1", "n3")] == 1


def test_var_length_validator_accepts_quantifier(spark, workdir):
    """kg.query validates first (F5): the quantifier must not make the
    bare relation label unresolvable."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[
            Entity("City", [Attribute("name", "string", True, True)]),
        ],
        relations=[Relation("ROAD", "City", "City", [])],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([("City", {"name": c}) for c in "abcd"])
    kg.add_edges([
        ("ROAD", "City", "City", {"name": s}, {"name": d})
        for s, d in [("a", "b"), ("b", "c"), ("c", "d")]
    ])
    out = kg.query(
        "MATCH (s:City {name: 'a'})-[:ROAD*1..2]->(t:City) RETURN t ORDER BY t"
    ).collect()
    assert [r.t for r in out] == ["b", "c"]
    out = kg.query(
        "MATCH p = shortestPath((s:City {name: 'a'})-[:ROAD*..8]->(t:City "
        "{name: 'd'})) RETURN length(p) AS d"
    ).collect()
    assert [r.d for r in out] == [3]


def test_unsupported_shapes_raise(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported):  # double-arrow is not Cypher
        run_cypher("MATCH (a)<-[:R]->(b) RETURN a", nodes, edges)
    with pytest.raises(CypherUnsupported):
        run_cypher("CREATE (a:X) RETURN a", nodes, edges)
    with pytest.raises(CypherUnsupported):  # MATCH after OPTIONAL MATCH
        run_cypher(
            "MATCH (a:Fighter) OPTIONAL MATCH (a)-[:FOUGHT_IN]->(f) "
            "MATCH (f)-[:PART_OF]->(e) RETURN a",
            nodes,
            edges,
        )


def test_undirected_leg_matches_both_orientations(graph):
    """Ref prompt surface: 'Specify relationship direction or omit it for
    either direction' — an undirected leg binds each stored edge twice,
    once per orientation (openCypher semantics)."""
    nodes, edges = graph
    got = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]-(x) RETURN f, x ORDER BY f, x",
        nodes,
        edges,
    ).collect()
    # directed: only Fighter->Fight rows; undirected adds nothing new here
    assert [(r.f, r.x) for r in got] == [
        ("Ana", "Ana v Bo"), ("Bo", "Ana v Bo"), ("Bo", "Bo v Cy"),
        ("Cy", "Bo v Cy"),
    ]
    # anchored from the Fight side the same undirected leg walks backwards
    got = run_cypher(
        "MATCH (x:Fight {title: 'Ana v Bo'})-[:FOUGHT_IN]-(f:Fighter) "
        "RETURN f ORDER BY f",
        nodes,
        edges,
    ).collect()
    assert [r.f for r in got] == ["Ana", "Bo"]


def test_undirected_var_length_walks_both_ways(graph):
    nodes, edges = graph
    # Ana -2hops- x over FOUGHT_IN ignoring direction: Ana..Fight..{Ana,Bo}
    got = run_cypher(
        "MATCH (a:Fighter {name: 'Ana'})-[:FOUGHT_IN*2..2]-(x:Fighter) "
        "RETURN x ORDER BY x",
        nodes,
        edges,
    ).collect()
    assert [r.x for r in got] == ["Ana", "Bo"]


def test_all_shortest_paths_distinct_projection(graph):
    """allShortestPaths collapses openCypher's one-row-per-path multiplicity
    to one row per (pair, length); only multiplicity-blind projections are
    accepted (ADVICE r03) — RETURN DISTINCT is exact."""
    nodes, edges = graph
    got = run_cypher(
        "MATCH p = allShortestPaths((a:Fighter {name: 'Ana'})-[*..6]-"
        "(e:Event)) RETURN DISTINCT e, length(p) AS d",
        nodes,
        edges,
    ).collect()
    assert [(r.e, r.d) for r in got] == [("Open 1", 2)]


def test_all_shortest_paths_multiplicity_observers_raise(graph):
    """ADVICE r03: a non-DISTINCT return (or count/sum/avg) over
    allShortestPaths could observe per-path row multiplicity, which the
    pair-level dedup does not reproduce — CypherUnsupported, not a silently
    wrong count."""
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="multiplicity"):
        run_cypher(
            "MATCH p = allShortestPaths((a:Fighter {name: 'Ana'})-[*..6]-"
            "(e:Event)) RETURN e, length(p) AS d",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="multiplicity"):
        run_cypher(
            "MATCH p = allShortestPaths((a:Fighter {name: 'Ana'})-[*..6]-"
            "(e:Event)) RETURN count(*) AS n",
            nodes, edges,
        )
    # multiplicity-blind aggregates stay available
    got = run_cypher(
        "MATCH p = allShortestPaths((a:Fighter {name: 'Ana'})-[*..6]-"
        "(e:Event)) RETURN count(DISTINCT e) AS n",
        nodes, edges,
    ).collect()
    assert got[0].n == 1


def test_shortest_path_min_hops_above_one_raises(graph):
    """ADVICE r03: shortestPath with lo >= 2 used to filter settled minima
    by lo, silently DROPPING pairs whose true min distance is below lo.
    Neo4j itself restricts shortestPath minHops to 0/1 — we raise."""
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="minHops"):
        run_cypher(
            "MATCH p = shortestPath((a:Fighter)-[*2..4]->(e:Event)) "
            "RETURN DISTINCT a, e, length(p) AS d",
            nodes, edges,
        )


def test_named_plain_path_binds_length(graph):
    """p = (a)-[:R*1..2]->(b) binds p for plain (non-shortest) var-length
    legs; length(p) is the walk length, one row per (pair, length)."""
    nodes, edges = graph
    got = run_cypher(
        "MATCH p = (f:Fighter {name: 'Ana'})-[*1..2]->(x) "
        "RETURN DISTINCT x, length(p) AS d ORDER BY d",
        nodes, edges,
    ).collect()
    assert [(r.x, r.d) for r in got] == [("Ana v Bo", 1), ("Open 1", 2)]
    # a pair reachable at two different lengths yields one row PER length
    # (undirected walks: Ana-F10-Bo at 2, Ana-F10-Ana-F10-Bo at 4)
    got = run_cypher(
        "MATCH p = (f:Fighter {name: 'Ana'})-[:FOUGHT_IN*2..4]-(g:Fighter) "
        "RETURN DISTINCT g, length(p) AS d ORDER BY g, d",
        nodes, edges,
    ).collect()
    assert [(r.g, r.d) for r in got] == [
        ("Ana", 2), ("Ana", 4), ("Bo", 2), ("Bo", 4), ("Cy", 4),
    ]


def test_named_path_over_plain_leg_is_length_one(graph):
    nodes, edges = graph
    got = run_cypher(
        "MATCH p = (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN DISTINCT f, length(p) AS d ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.d) for r in got] == [("Ana", 1), ("Bo", 1), ("Cy", 1)]


def test_named_path_requires_multiplicity_safe_projection(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="multiplicity"):
        run_cypher(
            "MATCH p = (f:Fighter)-[*1..2]->(x) RETURN f, x, length(p) AS d",
            nodes, edges,
        )


def test_escaped_quote_in_literal(graph):
    """ADVICE r03: a backslash-escaped quote ('O\\'Brien') must not close
    the quoted span early and let keyword scans fire inside the literal;
    the compared value is the UNESCAPED string."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name <> 'O\\'Brien RETURN AND LIMIT 9' "
        "RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo", "Cy"]
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name = 'O\\'Brien' RETURN f",
        nodes, edges,
    ).collect()
    assert out == []
    # IN-list items unescape too (and the comma split stays inside-quote safe)
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name IN ['O\\'Brien, AND', 'Ana'] "
        "RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana"]


def test_var_length_walk_vs_path_deviation_pin(spark):
    """DEVIATION PIN (VERDICT r03 #6): for m >= 2, var-length legs match
    per WALK, not per openCypher PATH — relationship-uniqueness along a
    path is not enforced. On the cycle a->b->a (two edges), openCypher's
    `(a)-[:E*2..2]->(x)` from a reaches a via the path a->b->a ONLY if the
    two traversed relationships differ; with single edges each way the
    path IS valid, but `*3..3` from a would need to reuse a->b, which
    Cypher forbids — a 3-hop WALK a->b->a->b exists though, so this engine
    returns (a, b) at depth 3 where FalkorDB/Neo4j return no row. Exact on
    acyclic graphs (every walk is a path); a superset on cyclic ones."""
    nodes = spark.createDataFrame(
        [(0, "N", "a", {}), (1, "N", "b", {})],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(0, "E", 1), (1, "E", 0)],
        "src_id bigint, label string, dst_id bigint",
    ).withColumn("props", F.create_map().cast("map<string,string>"))
    out = run_cypher(
        "MATCH (s:N {key: 'a'})-[:E*3..3]->(x) RETURN DISTINCT x",
        nodes.withColumn("props", F.create_map(F.lit("key"), F.col("key"))),
        edges,
    ).collect()
    # walk semantics: a->b->a->b exists, so x = b IS returned.
    # openCypher path semantics would return NO rows (edge a->b reused).
    assert [r.x for r in out] == ["b"]


def test_skip_offsets_sorted_rows(graph):
    nodes, edges = graph
    got = run_cypher(
        "MATCH (a:Fighter) RETURN a ORDER BY a SKIP 1 LIMIT 1", nodes, edges
    ).collect()
    assert [r.a for r in got] == ["Bo"]


def test_kg_query_surface(spark, workdir):
    """KnowledgeGraph.query validates (F5) then executes."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[
            Entity("Actor", [Attribute("name", "string", True, True)]),
            Entity("Movie", [Attribute("title", "string", True, True)]),
        ],
        relations=[
            Relation("ACTED_IN", "Actor", "Movie", []),
        ],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([
        ("Actor", {"name": "Jose"}), ("Actor", {"name": "Mira"}),
        ("Movie", {"title": "Tide"}),
    ])
    kg.add_edges([
        ("ACTED_IN", "Actor", "Movie", {"name": "Jose"}, {"title": "Tide"}),
        ("ACTED_IN", "Actor", "Movie", {"name": "Mira"}, {"title": "Tide"}),
    ])
    out = kg.query(
        "MATCH (a:Actor)-[:ACTED_IN]->(m:Movie) "
        "RETURN m, count(a) AS n_actors"
    ).collect()
    assert [(r.m, r.n_actors) for r in out] == [("Tide", 2)]
    # wrong direction is rejected by the validator before execution
    with pytest.raises(ValueError, match="direction"):
        kg.query("MATCH (a:Actor)<-[:ACTED_IN]-(m:Movie) RETURN a")


@pytest.fixture(scope="module")
def movie_graph(spark):
    """Actors -> movies with RELATIONSHIP props (role), for the rel-var /
    OPTIONAL MATCH / WITH subset (ref fixtures/prompts.py documents these
    constructs in the generated-query surface)."""
    nodes = spark.createDataFrame(
        [
            (1, "Person", "alice", {"age": "30"}),
            (2, "Person", "bob", {"age": "40"}),
            (3, "Person", "carol", {"age": "25"}),
            (10, "Movie", "m1", {"year": "1999"}),
            (11, "Movie", "m2", {"year": "2003"}),
        ],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            (1, "ACTED_IN", 10, {"role": "Neo"}),
            (1, "ACTED_IN", 11, {"role": "Neo2"}),
            (2, "ACTED_IN", 10, {"role": "Agent"}),
            (1, "KNOWS", 2, {}),
        ],
        "src_id bigint, label string, dst_id bigint, props map<string,string>",
    )
    return nodes.cache(), edges.cache()


def test_rel_var_props_in_where_and_return(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[r:ACTED_IN]->(m:Movie) "
        "WHERE r.role STARTS WITH 'Neo' "
        "RETURN p, m, r.role AS role ORDER BY role",
        nodes, edges,
    ).collect()
    assert [(r.p, r.m, r.role) for r in out] == [
        ("alice", "m1", "Neo"), ("alice", "m2", "Neo2")
    ]


def test_count_rel_var(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[r:ACTED_IN]->(m:Movie) "
        "RETURN p, count(r) AS n ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n) for r in out] == [("alice", 2), ("bob", 1)]


def test_optional_match_left_join_semantics(movie_graph):
    """Rows with no optional match survive with NULLs; count() skips them."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person) OPTIONAL MATCH (p)-[:ACTED_IN]->(m:Movie) "
        "RETURN p, count(m) AS n ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n) for r in out] == [
        ("alice", 2), ("bob", 1), ("carol", 0)
    ]


def test_optional_match_where_filters_at_match_time(movie_graph):
    """A WHERE after OPTIONAL MATCH narrows the optional side only — rows
    that then fail to match still appear with NULL (not filtered out)."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person) OPTIONAL MATCH (p)-[:ACTED_IN]->(m:Movie) "
        "WHERE m.year = '1999' RETURN p, count(m) AS n ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n) for r in out] == [
        ("alice", 1), ("bob", 1), ("carol", 0)
    ]


def test_optional_match_nulls_projected(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person) OPTIONAL MATCH (p)-[r:ACTED_IN]->(m:Movie) "
        "WHERE m.year = '2003' RETURN p, m, r.role AS role ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.m, r.role) for r in out] == [
        ("alice", "m2", "Neo2"), ("bob", None, None), ("carol", None, None)
    ]


def test_with_having_idiom(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "WITH p, count(m) AS n WHERE n >= 2 RETURN p, n",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n) for r in out] == [("alice", 2)]


def test_with_plain_projection_rename(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:KNOWS]->(q:Person) "
        "WITH p AS a, q AS b RETURN a, b",
        nodes, edges,
    ).collect()
    assert [(r.a, r.b) for r in out] == [("alice", "bob")]


def test_new_subset_boundaries_raise(movie_graph):
    nodes, edges = movie_graph
    with pytest.raises(CypherUnsupported):  # rel var would bind a rel LIST
        run_cypher(
            "MATCH (p)-[r:ACTED_IN*1..2]->(m) RETURN p", nodes, edges
        )
    with pytest.raises(CypherUnsupported):  # disjoint optional pattern
        run_cypher(
            "MATCH (p:Person) OPTIONAL MATCH (x:Movie) RETURN p",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported):  # RETURN col unknown after WITH
        run_cypher(
            "MATCH (p:Person) WITH p RETURN p, count(z) AS n", nodes, edges
        )
    with pytest.raises(CypherUnsupported):  # bare rel var in RETURN
        run_cypher(
            "MATCH (p)-[r:ACTED_IN]->(m) RETURN r", nodes, edges
        )
    with pytest.raises(CypherUnsupported):  # duplicate var as node and rel
        run_cypher(
            "MATCH (p:Person)-[p:ACTED_IN]->(m) RETURN m", nodes, edges
        )


def test_collect_aggregate(movie_graph):
    """openCypher collect(): list aggregate, NULLs skipped, sorted for
    determinism (documented deviation — Cypher leaves order unspecified)."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "RETURN p, collect(m) AS movies ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.movies) for r in out] == [
        ("alice", ["m1", "m2"]), ("bob", ["m1"]),
    ]
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "RETURN collect(DISTINCT m) AS ms",
        nodes, edges,
    ).collect()
    assert out[0].ms == ["m1", "m2"]
    out = run_cypher(
        "MATCH (p:Person)-[r:ACTED_IN]->(m:Movie) "
        "RETURN m, collect(r.role) AS roles ORDER BY m",
        nodes, edges,
    ).collect()
    assert [(r.m, r.roles) for r in out] == [
        ("m1", ["Agent", "Neo"]), ("m2", ["Neo2"]),
    ]


def test_collect_after_with_and_through_carry(movie_graph):
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "WITH p AS person, count(m) AS n "
        "RETURN collect(person) AS people, max(n) AS top",
        nodes, edges,
    ).collect()
    assert out[0].people == ["alice", "bob"] and out[0].top == 2.0
    # collect computed in the WITH stage survives a MATCH-after-WITH
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "WITH p, collect(m) AS ms "
        "MATCH (p)-[:KNOWS]->(q:Person) RETURN p, q, ms",
        nodes, edges,
    ).collect()
    assert [(r.p, r.q, r.ms) for r in out] == [("alice", "bob", ["m1", "m2"])]


def test_numeric_aggregates(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN x.title AS title, sum(f.wins) AS total_wins, "
        "max(f.wins) AS best, avg(f.wins) AS mean "
        "ORDER BY title",
        nodes, edges,
    ).collect()
    assert [(r.title, r.total_wins, r.best, r.mean) for r in out] == [
        ("Ana v Bo", 19.0, 12.0, 9.5),
        ("Bo v Cy", 10.0, 7.0, 5.0),
    ]


def test_numeric_aggregate_after_with(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH x.rounds AS rounds, count(f) AS fighters "
        "RETURN sum(rounds) AS total_rounds, min(fighters) AS min_fighters",
        nodes, edges,
    ).collect()
    assert [(r.total_rounds, r.min_fighters) for r in out] == [(8.0, 2.0)]


def test_numeric_aggregate_rejects_distinct_and_bare_var(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported):
        run_cypher(
            "MATCH (f:Fighter) RETURN sum(DISTINCT f.wins) AS s",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported):
        run_cypher("MATCH (f:Fighter) RETURN sum(f) AS s", nodes, edges)


def test_where_in_string_list(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name IN ['Ana', 'Cy'] "
        "RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]


def test_where_in_numeric_list(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.wins IN [3, 12] RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]


def test_where_in_empty_list_matches_nothing(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name IN [] RETURN f", nodes, edges
    ).collect()
    assert out == []


def test_where_or_binds_looser_than_and(graph):
    # Cypher precedence: a OR b AND c  ==  a OR (b AND c)
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WHERE f.name = 'Cy' OR f.wins >= 7 AND x.title CONTAINS 'Ana' "
        "RETURN f, x.title AS title ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.title) for r in out] == [
        ("Ana", "Ana v Bo"), ("Bo", "Ana v Bo"), ("Cy", "Bo v Cy"),
    ]


def test_where_is_null_on_missing_prop(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.nick IS NULL AND f.wins >= 7 "
        "RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo"]
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.wins IS NOT NULL RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo", "Cy"]


def test_where_or_inside_literal_not_split(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name <> 'X OR Y AND Z' "
        "RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo", "Cy"]


def test_where_rejects_mixed_in_list_and_dangling_or(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported):
        run_cypher(
            "MATCH (f:Fighter) WHERE f.name IN ['Ana', 7] RETURN f",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported):
        run_cypher(
            "MATCH (f:Fighter) WHERE f.name = 'Ana' OR RETURN f",
            nodes, edges,
        )


def test_rel_type_alternation(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a)-[:FOUGHT_IN|PART_OF]->(b) RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert out[0].n == 6  # 4 FOUGHT_IN + 2 PART_OF
    # legacy [:A|:B] spelling is accepted too
    out = run_cypher(
        "MATCH (a)-[:FOUGHT_IN|:PART_OF]->(b) RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert out[0].n == 6


def test_rel_type_alternation_var_length(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN|PART_OF*2..2]->(e:Event) "
        "RETURN DISTINCT f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo", "Cy"]


def test_where_parenthesized_groups(graph):
    """VERDICT r03 #2: (a OR b) AND c — parens override Cypher's
    AND-binds-tighter precedence, at any nesting depth."""
    nodes, edges = graph
    # without parens: 'Cy' OR ('Ana' AND wins>=10) -> Ana, Cy
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name = 'Cy' OR f.name = 'Ana' "
        "AND f.wins >= 10 RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]
    # with parens: ('Cy' OR 'Ana') AND wins>=10 -> Ana only
    out = run_cypher(
        "MATCH (f:Fighter) WHERE (f.name = 'Cy' OR f.name = 'Ana') "
        "AND f.wins >= 10 RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana"]
    # nested groups + function parens inside a group
    out = run_cypher(
        "MATCH (f:Fighter) WHERE ((toLower(f.name) = 'cy' OR f.wins > 10) "
        "AND (f.wins < 5 OR f.name STARTS WITH 'A')) RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]
    # a paren inside a string literal is not a group
    out = run_cypher(
        "MATCH (f:Fighter) WHERE (f.name <> '(x OR y' AND f.wins >= 7) "
        "OR f.name = 'Cy' RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Bo", "Cy"]
    with pytest.raises(CypherUnsupported):  # unbalanced group
        run_cypher(
            "MATCH (f:Fighter) WHERE (f.name = 'Cy' RETURN f", nodes, edges
        )


def test_where_not(graph):
    """NOT binds tighter than AND and composes with groups."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE NOT f.name = 'Bo' RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]
    out = run_cypher(
        "MATCH (f:Fighter) WHERE NOT (f.name = 'Bo' OR f.wins < 5) "
        "RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana"]
    # NOT a AND b  ==  (NOT a) AND b
    out = run_cypher(
        "MATCH (f:Fighter) WHERE NOT f.name = 'Bo' AND f.wins >= 5 "
        "RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana"]
    # double negation
    out = run_cypher(
        "MATCH (f:Fighter) WHERE NOT NOT f.name = 'Bo' RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Bo"]


def test_match_after_with_aggregate_then_expand(graph):
    """VERDICT r03 #3: MATCH ... WITH agg AS x MATCH ... — the WITH output
    is a bound relation the second MATCH joins; the aggregate stays
    referable in RETURN."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n_fights "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight)-[:PART_OF]->(e:Event) "
        "RETURN DISTINCT f, n_fights, e ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.n_fights, r.e) for r in out] == [
        ("Ana", 1, "Open 1"), ("Bo", 2, "Open 1"), ("Cy", 1, "Open 1"),
    ]
    # HAVING between the stages filters before the expand
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n WHERE n >= 2 "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight) "
        "RETURN f, n, count(y) AS m",
        nodes, edges,
    ).collect()
    assert [(r.f, r.n, r.m) for r in out] == [("Bo", 2, 2)]


def test_match_after_with_alias_and_aggregation_over_carried(graph):
    nodes, edges = graph
    # carried var renamed by AS; WHERE after the second MATCH filters the
    # joined plan; final RETURN aggregates over the carried aggregate
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH x AS fight, count(f) AS nf "
        "MATCH (fight)-[:PART_OF]->(e:Event) WHERE e.city = 'Rio' "
        "RETURN e, sum(nf) AS total ORDER BY e",
        nodes, edges,
    ).collect()
    assert [(r.e, r.total) for r in out] == [("Open 1", 4.0)]


def test_optional_match_after_with(movie_graph):
    """Top-k then optionally expand: the optional group left-joins onto
    the carried relation; rows that match nothing keep NULLs."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "WITH p, count(m) AS n "
        "OPTIONAL MATCH (p)-[:KNOWS]->(q:Person) "
        "RETURN p, n, q ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n, r.q) for r in out] == [
        ("alice", 2, "bob"), ("bob", 1, None),
    ]
    # match-time WHERE on the optional side still applies pre-join
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "WITH p, count(m) AS n "
        "OPTIONAL MATCH (p)-[r:ACTED_IN]->(m2:Movie) "
        "WHERE m2.year = '2003' "
        "RETURN p, n, count(m2) AS k ORDER BY p",
        nodes, edges,
    ).collect()
    assert [(r.p, r.n, r.k) for r in out] == [("alice", 2, 1), ("bob", 1, 0)]


def test_chained_stages_match_with_match_with(graph):
    """Any number of WITH-separated stages: aggregate, expand, aggregate
    again — the final WITH feeds RETURN as a plain-column namespace."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS nf "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight)-[:PART_OF]->(e:Event) "
        "WITH e, sum(nf) AS total, count(y) AS m "
        "RETURN e, total, m",
        nodes, edges,
    ).collect()
    assert [(r.e, r.total, r.m) for r in out] == [("Open 1", 6.0, 4)]


def test_chained_stages_extra_column_passthrough(movie_graph):
    """A plain column produced by an earlier WITH survives later carry
    boundaries and stays referable at the end."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) WITH p, count(m) AS n "
        "MATCH (p)-[:KNOWS]->(q:Person) WITH q, n "
        "MATCH (q)-[:ACTED_IN]->(m2:Movie) "
        "RETURN q, n, count(m2) AS k",
        nodes, edges,
    ).collect()
    assert [(r.q, r.n, r.k) for r in out] == [("bob", 2, 1)]


def test_chained_with_without_match_between(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WITH f.wins AS w WITH max(w) AS mx RETURN mx",
        nodes, edges,
    ).collect()
    assert [r.mx for r in out] == [12.0]


def test_match_after_with_scoping(graph):
    nodes, edges = graph
    # a var NOT carried through WITH is fresh after it: `x` below is a
    # new unrelated variable, so every (f, fight) combination matches
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f MATCH (x:Fight) RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert out[0].n == 8  # 4 pre-WITH rows (multiplicity kept) x 2 fights
    with pytest.raises(CypherUnsupported, match="carried"):
        run_cypher(
            "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
            "WITH f MATCH (f:Fight) RETURN f",
            nodes, edges,
        )


def test_case_insensitive_and_regex_compares(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE toLower(f.name) = 'ana' RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana"]
    out = run_cypher(
        "MATCH (f:Fighter) WHERE toUpper(f.name) STARTS WITH 'B' RETURN f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Bo"]
    # =~ is a WHOLE-string match: 'A.' must not match 'Ana'
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name =~ 'A.' RETURN f", nodes, edges
    ).collect()
    assert out == []
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name =~ 'A.*|Cy' RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Ana", "Cy"]


def test_with_order_limit_topk_then_expand(graph):
    """WITH … ORDER BY … LIMIT truncates the INTERMEDIATE relation (the
    top-k-then-expand shape) — not the final result. Before r4 the
    boundary ORDER BY/LIMIT silently bound globally, limiting the WRONG
    relation."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n ORDER BY n DESC, f LIMIT 1 "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight)-[:PART_OF]->(e:Event) "
        "RETURN f AS fighter, n, count(e) AS ev",
        nodes, edges,
    ).collect()
    # Bo has 2 fights (top-1); both fights roll up to the one event
    assert [(r.fighter, r.n, r.ev) for r in out] == [("Bo", 2, 2)]


def test_with_order_skip_and_final_boundary(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f AS fighter, count(x) AS n ORDER BY n DESC, fighter SKIP 1 "
        "LIMIT 2 RETURN fighter, n ORDER BY fighter",
        nodes, edges,
    ).collect()
    assert [(r.fighter, r.n) for r in out] == [("Ana", 1), ("Cy", 1)]


def test_with_order_by_carried_prop(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n ORDER BY f.name DESC LIMIT 1 "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight) RETURN f AS fighter, n",
        nodes, edges,
    ).collect()
    assert [(r.fighter, r.n) for r in out] == [("Cy", 1)]


def test_with_order_without_limit_is_noop(graph):
    """Documented deviation: intermediate ORDER BY with no SKIP/LIMIT is
    dropped (row order is unobservable downstream; a global sort at a
    boundary would be a pointless shuffle at scale)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n ORDER BY n DESC "
        "MATCH (f)-[:FOUGHT_IN]->(y:Fight) RETURN count(y) AS total",
        nodes, edges,
    ).collect()
    assert out[0].total == 4


def test_with_limit_without_order_raises(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="requires ORDER BY"):
        run_cypher(
            "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
            "WITH f, count(x) AS n LIMIT 1 "
            "MATCH (f)-[:FOUGHT_IN]->(y:Fight) RETURN count(y) AS t",
            nodes, edges,
        )


def test_order_by_outside_with_or_return_raises(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="ORDER BY must follow"):
        run_cypher("MATCH (f:Fighter) ORDER BY f RETURN f", nodes, edges)
    with pytest.raises(CypherUnsupported, match="LIMIT must follow"):
        run_cypher("MATCH (f:Fighter) LIMIT 2 RETURN f", nodes, edges)


def test_clauses_after_return_raise(graph):
    """Only ORDER BY / SKIP / LIMIT may follow RETURN: a trailing
    MATCH/WITH/RETURN used to be silently folded into the pipeline,
    executing a different query than the malformed input."""
    nodes, edges = graph
    for q in (
        "MATCH (f:Fighter) RETURN f MATCH (x:Fight)",
        "MATCH (f:Fighter) RETURN f WITH f",
        "MATCH (f:Fighter) RETURN f RETURN f",
    ):
        with pytest.raises(CypherUnsupported, match="after RETURN"):
            run_cypher(q, nodes, edges)
    # swapped SKIP/ORDER BY after RETURN stays accepted (same semantics)
    out = run_cypher(
        "MATCH (f:Fighter) RETURN f SKIP 1 ORDER BY f", nodes, edges
    ).collect()
    assert [r.f for r in out] == ["Bo", "Cy"]


def test_facade_validates_then_runs_boundary_topk(spark, workdir):
    """kg.query validates first (F5): the WITH…ORDER BY…LIMIT boundary
    must pass validation and execute through the facade."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[Entity("City", [Attribute("name", "string", True, True)])],
        relations=[Relation("ROAD", "City", "City", [])],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([("City", {"name": c}) for c in "abcd"])
    kg.add_edges([
        ("ROAD", "City", "City", {"name": s}, {"name": d})
        for s, d in [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("c", "d")]
    ])
    out = kg.query(
        "MATCH (s:City)-[:ROAD]->(t:City) "
        "WITH s, count(t) AS deg ORDER BY deg DESC, s LIMIT 1 "
        "MATCH (s)-[:ROAD]->(u:City) RETURN s AS hub, deg, count(u) AS n"
    ).collect()
    assert [(r.hub, r.deg, r.n) for r in out] == [("a", 3, 3)]

# ---- CALL algo.SPpaths / algo.SSpaths (ref fixtures/prompts.py:394-398) ----


@pytest.fixture(scope="module")
def road_graph(spark):
    """Weighted road chain C0-1->C1-2->C2-3->C3-4->C4 plus an expensive
    C0-10->C3 shortcut and one edge with no weight prop (C3->C0)."""
    nodes = spark.createDataFrame(
        [(i, "City", f"C{i}", {"name": f"C{i}"}) for i in range(5)],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    rows = [
        (0, 1, {"dist": "1"}), (1, 2, {"dist": "2"}), (2, 3, {"dist": "3"}),
        (3, 4, {"dist": "4"}), (0, 3, {"dist": "10"}), (3, 0, {}),
    ]
    edges = spark.createDataFrame(
        [(s, "ROAD", d, p) for s, d, p in rows],
        "src_id bigint, label string, dst_id bigint, "
        "props map<string,string>",
    )
    return nodes.cache(), edges.cache()


def test_sppaths_min_weight_beats_direct_edge(road_graph):
    """SPpaths returns the cheapest WALK weight — the 1+2+3 chain, not
    the weight-10 direct edge."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C3'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "relTypes: ['ROAD'], weightProp: 'dist', maxLen: 4}) "
        "YIELD pathWeight "
        "RETURN a AS src, b AS dst, pathWeight",
        nodes, edges,
    ).collect()
    assert [(r.src, r.dst, r.pathWeight) for r in out] == [("C0", "C3", 6.0)]


def test_sppaths_unreachable_pair_yields_no_row(road_graph):
    """maxLen 1 can't bridge C0->C3 cheaper than the direct edge; with
    relTypes excluding ROAD nothing is traversable -> zero rows (CALL
    row semantics)."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C4'}), (b:City {name: 'C0'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist', maxLen: 8}) YIELD pathWeight "
        "RETURN pathWeight",
        nodes, edges,
    ).collect()
    assert out == []  # C3->C0 has no weight prop: not traversable


def test_sspaths_per_destination_excludes_source(road_graph):
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SSpaths({sourceNode: a, weightProp: 'dist', maxLen: 2}) "
        "YIELD pathWeight AS pw "
        "RETURN a AS src, pw ORDER BY pw",
        nodes, edges,
    ).collect()
    # within 2 hops: C1 (1), C2 (1+2), C3 (min(10, ...)=10 via direct);
    # 2-hop C0->3 alternatives: 1+2 stops at C2; C0-10->C3-4->C4 = 14
    assert [(r.src, r.pw) for r in out] == [
        ("C0", 1.0), ("C0", 3.0), ("C0", 10.0), ("C0", 14.0),
    ]


def test_sspaths_where_after_yield_filters(road_graph):
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SSpaths({sourceNode: a, weightProp: 'dist', maxLen: 2}) "
        "YIELD pathWeight WHERE pathWeight <= 3 "
        "RETURN count(*) AS n, min(pathWeight) AS lo, max(pathWeight) AS hi",
        nodes, edges,
    ).collect()
    assert [(r.n, r.lo, r.hi) for r in out] == [(2, 1.0, 3.0)]


def test_sspaths_hop_count_and_direction_both(road_graph):
    """No weightProp -> every edge costs 1 (hop count); relDirection
    'both' symmetrizes, so C4 reaches its chain neighbor in 1 hop."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C4'}) "
        "CALL algo.SSpaths({sourceNode: a, relDirection: 'both', "
        "maxLen: 1}) YIELD pathWeight "
        "RETURN count(*) AS n_adjacent",
        nodes, edges,
    ).collect()
    assert [r.n_adjacent for r in out] == [1]


def test_sppaths_incoming_direction(road_graph):
    """relDirection 'incoming' traverses edges backwards: C3 reaches C0
    against the chain arrows."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C3'}), (b:City {name: 'C0'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist', relDirection: 'incoming', maxLen: 4}) "
        "YIELD pathWeight RETURN pathWeight",
        nodes, edges,
    ).collect()
    assert [r.pathWeight for r in out] == [6.0]


def test_call_yield_rides_with_boundary_and_later_stage(road_graph):
    """pathWeight enters the plain-column namespace: aggregate it at a
    WITH boundary, then keep matching — and a CALL can also run in a
    post-WITH stage against carried vars."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City) "
        "CALL algo.SSpaths({sourceNode: a, weightProp: 'dist', "
        "maxLen: 1}) YIELD pathWeight "
        "WITH a, min(pathWeight) AS nearest "
        "RETURN count(a) AS n_sources, min(nearest) AS lo, "
        "max(nearest) AS hi",
        nodes, edges,
    ).collect()
    # every city with at least one weighted out-edge: C0(1) C1(2) C2(3)
    # C3(4); C4 has none
    assert [(r.n_sources, r.lo, r.hi) for r in out] == [(4, 1.0, 4.0)]
    out2 = run_cypher(
        "MATCH (s:City)-[:ROAD]->(t:City) "
        "WITH s, count(t) AS deg WHERE deg >= 2 "
        "MATCH (s)-[:ROAD]->(u:City {name: 'C1'}) "
        "CALL algo.SSpaths({sourceNode: u, weightProp: 'dist', "
        "maxLen: 1}) YIELD pathWeight "
        "RETURN s, u, pathWeight",
        nodes, edges,
    ).collect()
    # C0 is the only out-degree-2 node; u = C1; C1's 1-hop reach: C2 @ 2
    assert [(r.s, r.u, r.pathWeight) for r in out2] == [("C0", "C1", 2.0)]


def test_var_length_rel_var_size(road_graph):
    """-[r:R*m..n]-> (r5): implicit walk binding — size(r)/length(r) =
    hop count, one row per (pair, hop count), DISTINCT required for
    multiplicity-sensitive shapes; element access raises."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'})-[r:ROAD*1..3]->(b:City) "
        "RETURN DISTINCT b, size(r) AS hops ORDER BY b, hops",
        nodes, edges,
    ).collect()
    # chain 0->1->2->3 plus shortcut 0->3 and 3->0/3->4 beyond
    assert [(r.b, r.hops) for r in out] == [
        ("C0", 2), ("C1", 1), ("C1", 3), ("C2", 2),
        ("C3", 1), ("C3", 3), ("C4", 2),
    ]
    # length(r) is the deprecated-but-accepted spelling
    out2 = run_cypher(
        "MATCH (a:City {name: 'C0'})-[r:ROAD*2..2]->(b:City) "
        "RETURN DISTINCT b, length(r) AS hops ORDER BY b",
        nodes, edges,
    ).collect()
    assert [(r.b, r.hops) for r in out2] == [("C0", 2), ("C2", 2), ("C4", 2)]


def test_var_length_rel_var_guards(road_graph):
    nodes, edges = road_graph
    for bad, why in [
        ("MATCH (a:City)-[r:ROAD*1..2]->(b:City) RETURN r",
         "the list itself"),
        ("MATCH (a:City)-[r:ROAD*1..2]->(b:City) RETURN b, r.name",
         "element props"),
        ("MATCH (a:City)-[r:ROAD*1..2]->(b:City) RETURN count(b) AS n",
         "multiplicity-sensitive count over collapsed walk rows"),
        ("MATCH p = (a:City)-[r:ROAD*1..2]->(b:City) RETURN length(p)",
         "path and rel bound together"),
        ("MATCH (a:City)-[r:ROAD*1..2]->(b:City) "
         "MATCH (b)-[q:ROAD*1..2]->(c:City) RETURN DISTINCT size(r), r",
         "RETURN of the walk var"),
        ("MATCH (a:City {name: 'C0'})-[:ROAD]->(b:City) "
         "RETURN size(b) AS s", "size() of a node var"),
    ]:
        assert why  # documents the rejected shape
        with pytest.raises(CypherUnsupported):
            run_cypher(bad, nodes, edges).collect()


def test_sppaths_yield_path_route(road_graph):
    """YIELD path (r5): the textual node-key route of ONE cheapest walk
    — C0->C1->C2->C3 (weight 6) beats the direct weight-10 edge; both
    observables together, either order, aliased."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C3'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "relTypes: ['ROAD'], weightProp: 'dist', maxLen: 4}) "
        "YIELD path, pathWeight AS w "
        "RETURN path, w",
        nodes, edges,
    ).collect()
    assert [(r.path, r.w) for r in out] == [("C0->C1->C2->C3", 6.0)]
    # path alone, maxLen too small for the chain: the direct edge wins
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C3'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist', maxLen: 1}) YIELD path AS p RETURN p",
        nodes, edges,
    ).collect()
    assert [r.p for r in out] == [["C0->C3"][0]]


def test_sspaths_yield_path_per_destination(road_graph):
    """SSpaths YIELD path: one route per reachable destination; the
    yielded column filters in a post-YIELD WHERE and rides RETURN
    ORDER BY."""
    nodes, edges = road_graph
    out = run_cypher(
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SSpaths({sourceNode: a, weightProp: 'dist', "
        "maxLen: 4}) YIELD path, pathWeight "
        "WHERE pathWeight < 7 "
        "RETURN path, pathWeight ORDER BY pathWeight",
        nodes, edges,
    ).collect()
    assert [(r.path, r.pathWeight) for r in out] == [
        ("C0->C1", 1.0),
        ("C0->C1->C2", 3.0),
        ("C0->C1->C2->C3", 6.0),
    ]


def test_sppaths_path_tie_break_deterministic(spark):
    """Two equal-weight routes: the struct(d, path) min keeps the
    lexicographically smaller id-sequence — stable across runs."""
    nodes = spark.createDataFrame(
        [(i, "V", f"N{i}", {"name": f"N{i}"}) for i in range(4)],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    # 0->1->3 and 0->2->3, both weight 2: ids [0,1,3] < [0,2,3]
    edges = spark.createDataFrame(
        [(0, "E", 1, {"w": "1"}), (1, "E", 3, {"w": "1"}),
         (0, "E", 2, {"w": "1"}), (2, "E", 3, {"w": "1"})],
        "src_id bigint, label string, dst_id bigint, props map<string,string>",
    )
    for _ in range(3):
        out = run_cypher(
            "MATCH (a:V {name: 'N0'}), (b:V {name: 'N3'}) "
            "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
            "weightProp: 'w', maxLen: 3}) YIELD path, pathWeight "
            "RETURN path, pathWeight",
            nodes, edges,
        ).collect()
        assert [(r.path, r.pathWeight) for r in out] == [("N0->N1->N3", 2.0)]


def test_call_subset_boundaries_raise(road_graph):
    nodes, edges = road_graph
    cases = [
        # unknown YIELD item
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C1'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist'}) YIELD pathCost RETURN pathCost",
        # duplicate YIELD item
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C1'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist'}) YIELD path, path AS p RETURN p",
        # pathCount must be a positive integer literal (k > 1 is
        # SUPPORTED since r5 — see test_call_sppaths_pathcount_topk)
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C1'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist', pathCount: 0}) YIELD pathWeight "
        "RETURN pathWeight",
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C1'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist', pathCount: 'two'}) YIELD pathWeight "
        "RETURN pathWeight",
        # SSpaths with a targetNode
        "MATCH (a:City {name: 'C0'}), (b:City {name: 'C1'}) "
        "CALL algo.SSpaths({sourceNode: a, targetNode: b, "
        "weightProp: 'dist'}) YIELD pathWeight RETURN pathWeight",
        # unbound source var
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SSpaths({sourceNode: z, weightProp: 'dist'}) "
        "YIELD pathWeight RETURN pathWeight",
        # same var as both endpoints
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: a, "
        "weightProp: 'dist'}) YIELD pathWeight RETURN pathWeight",
        # CALL after OPTIONAL MATCH (NULLable sourceNode)
        "MATCH (a:City {name: 'C0'}) OPTIONAL MATCH (a)-[:ROAD]->(b:City) "
        "CALL algo.SSpaths({sourceNode: b, weightProp: 'dist'}) "
        "YIELD pathWeight RETURN pathWeight",
        # unknown procedure
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.BFS({sourceNode: a}) YIELD pathWeight RETURN pathWeight",
        # unknown param
        "MATCH (a:City {name: 'C0'}) "
        "CALL algo.SSpaths({sourceNode: a, minLen: 2}) YIELD pathWeight "
        "RETURN pathWeight",
    ]
    for q in cases:
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


def test_facade_runs_sppaths_call(spark, workdir):
    """End-to-end through kg.query: the validator must pass the CALL
    clause (the relTypes list is not an edge pattern) and the executor
    must run it."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[Entity("City", [Attribute("name", "string", True, True)])],
        relations=[
            Relation(
                "ROAD", "City", "City",
                [Attribute("dist", "string", False, False)],
            )
        ],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([("City", {"name": c}) for c in ("a", "b", "c")])
    kg.add_edges([
        ("ROAD", "City", "City", {"name": s}, {"name": d}, {"dist": w})
        for s, d, w in [("a", "b", "1"), ("b", "c", "2"), ("a", "c", "9")]
    ])
    out = kg.query(
        "MATCH (s:City {name: 'a'}), (t:City {name: 'c'}) "
        "CALL algo.SPpaths({sourceNode: s, targetNode: t, "
        "relTypes: ['ROAD'], weightProp: 'dist'}) YIELD pathWeight "
        "RETURN s, t, pathWeight"
    ).collect()
    assert [(r.s, r.t, r.pathWeight) for r in out] == [("a", "c", 3.0)]


# ---- property-to-property compares and exists() ----------------------


def test_where_prop_to_prop_numeric_and_string(graph):
    """a.x > b.y compares numerically when both sides parse as numbers;
    string props compare lexically."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a:Fighter)-[:FOUGHT_IN]->(x:Fight)<-[:FOUGHT_IN]-(b:Fighter) "
        "WHERE a.wins > b.wins "
        "RETURN a.name AS winner, b.name AS loser ORDER BY winner, loser",
        nodes, edges,
    ).collect()
    # numeric: 12 > 7, 7 > 3 (string compare would also say '7' > '12')
    assert [(r.winner, r.loser) for r in out] == [
        ("Ana", "Bo"), ("Bo", "Cy"),
    ]
    out2 = run_cypher(
        "MATCH (a:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WHERE x.title STARTS WITH a.name "
        "RETURN a.name AS name ORDER BY name",
        nodes, edges,
    ).collect()
    assert [r.name for r in out2] == ["Ana", "Bo"]


def test_where_exists_prop(graph):
    """exists(n.prop) is IS NOT NULL; fights have no 'city' prop."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (x:Fight)-[:PART_OF]->(e:Event) "
        "WHERE exists(e.city) AND NOT exists(x.city) "
        "RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert [r.n for r in out] == [2]


def test_prop_to_prop_null_side_filters(graph):
    """A missing prop on either side of a.x > b.y yields NULL -> the row
    is filtered (Cypher parity), not matched by the string fallback."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (x:Fight)-[:PART_OF]->(e:Event) "
        "WHERE x.rounds > e.city RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    # rounds is numeric-string, city is 'Rio': mixed -> string compare
    # '3' > 'Rio' and '5' > 'Rio' are both false (digits < letters)
    assert [r.n for r in out] == [0]
    out2 = run_cypher(
        "MATCH (x:Fight)-[:PART_OF]->(e:Event) "
        "WHERE e.nosuch > x.rounds RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert [r.n for r in out2] == [0]


# ---- final ORDER BY: unaliased aggregates and var.prop sort keys ------


def test_order_by_unaliased_aggregate(graph):
    """`ORDER BY count(x) DESC` without an alias — the shape generated
    queries emit — resolves to the projected aggregate's column."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN f, count(x) ORDER BY count(x) DESC, f LIMIT 2",
        nodes, edges,
    ).collect()
    assert [(r.f, r.count_x) for r in out] == [("Bo", 2), ("Ana", 1)]


def test_order_by_non_returned_prop(graph):
    """`RETURN f ORDER BY f.wins DESC` — the sort key rides as a hidden
    projection column and is dropped from the result."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN f.name AS name ORDER BY f.wins DESC",
        nodes, edges,
    )
    assert out.columns == ["name"]
    # numeric order: 12, 7, 3 (string order would put '3' < '7' < '12'
    # differently: '12' < '3' < '7')
    assert [r.name for r in out.collect()] == ["Ana", "Bo", "Cy"]


def test_order_by_hidden_prop_after_distinct_or_agg_raises(graph):
    nodes, edges = graph
    for q in (
        "MATCH (f:Fighter) RETURN DISTINCT f ORDER BY f.wins",
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN f, count(x) ORDER BY f.wins",
    ):
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


# ---- WHERE pattern predicates (existence semi/anti joins) -------------


def test_where_not_pattern_predicate(graph):
    """`WHERE NOT (f)-[:R]->(x)` — the "without" shape. Ana and Cy each
    fought once; everyone fought, so filter against a specific fight."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) "
        "WHERE NOT (f)-[:FOUGHT_IN]->(:Fight {title: 'Ana v Bo'}) "
        "RETURN f ORDER BY f",
        nodes, edges,
    ).collect()
    assert [r.f for r in out] == ["Cy"]


def test_where_pattern_predicate_positive_and_mixed(graph):
    """Existence predicate AND a plain condition in one WHERE; row
    multiplicity is preserved (Bo has two fights, still one row per
    match binding)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WHERE (x)-[:PART_OF]->(:Event) AND f.wins >= 7 "
        "RETURN f.name AS name, x.title AS title ORDER BY name, title",
        nodes, edges,
    ).collect()
    assert [(r.name, r.title) for r in out] == [
        ("Ana", "Ana v Bo"), ("Bo", "Ana v Bo"), ("Bo", "Bo v Cy"),
    ]


def test_where_pattern_predicate_between_bound_vars(graph):
    """Both endpoints bound: `WHERE NOT (a)-[:R]->(b)` filters pairs."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter), (x:Fight) "
        "WHERE NOT (f)-[:FOUGHT_IN]->(x) "
        "RETURN f, x ORDER BY f, x",
        nodes, edges,
    ).collect()
    assert [(r.f, r.x) for r in out] == [
        ("Ana", "Bo v Cy"), ("Cy", "Ana v Bo"),
    ]


def test_where_pattern_predicate_boundaries(graph):
    nodes, edges = graph
    cases = [
        # var-length predicate
        "MATCH (f:Fighter) WHERE NOT (f)-[:FOUGHT_IN*1..2]->(:Event) "
        "RETURN f",
        # OR with a pattern predicate
        "MATCH (f:Fighter) "
        "WHERE (f)-[:FOUGHT_IN]->(:Fight) OR f.wins > 5 RETURN f",
        # no bound endpoint
        "MATCH (f:Fighter) WHERE (a)-[:PART_OF]->(b) RETURN f",
        # relationship variable inside a predicate
        "MATCH (f:Fighter) WHERE (f)-[r:FOUGHT_IN]->(:Fight) RETURN f",
    ]
    for q in cases:
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


# ---- UNWIND literal lists ---------------------------------------------


def test_unwind_batch_lookup(graph):
    """UNWIND ['Ana','Cy'] AS v + WHERE f.name = v — the multi-entity
    lookup shape; the alias is returnable and aggregable."""
    nodes, edges = graph
    out = run_cypher(
        "UNWIND ['Ana', 'Cy', 'Nobody'] AS v "
        "MATCH (f:Fighter) WHERE f.name = v "
        "RETURN v, f.wins AS wins ORDER BY v",
        nodes, edges,
    ).collect()
    assert [(r.v, r.wins) for r in out] == [("Ana", "12"), ("Cy", "3")]


def test_unwind_rows_multiply_and_aggregate(graph):
    """One row per element per match (openCypher row semantics); the
    alias groups like any column."""
    nodes, edges = graph
    out = run_cypher(
        "UNWIND [1, 2] AS k MATCH (f:Fighter) "
        "WHERE f.wins >= k RETURN k, count(f) AS n ORDER BY k",
        nodes, edges,
    ).collect()
    # all three fighters have wins >= 1 and >= 2
    assert [(r.k, r.n) for r in out] == [(1.0, 3), (2.0, 3)]
    out2 = run_cypher(
        "UNWIND ['a', 'b'] AS t MATCH (f:Fighter) "
        "RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert [r.n for r in out2] == [6]  # 2 elements x 3 fighters


def test_unwind_empty_list_and_boundaries(graph):
    nodes, edges = graph
    out = run_cypher(
        "UNWIND [] AS v MATCH (f:Fighter) RETURN count(*) AS n",
        nodes, edges,
    ).collect()
    assert [r.n for r in out] == [0]
    # UNWIND after WITH is SUPPORTED since r4 s4 (stage-opening)
    out = run_cypher(
        "MATCH (f:Fighter) WITH f UNWIND ['a'] AS v RETURN v",
        nodes, edges,
    ).collect()
    assert [r.v for r in out] == ["a", "a", "a"]
    for q in (
        # expression UNWIND
        "UNWIND collect(f) AS v MATCH (f:Fighter) RETURN v",
        # mixed types
        "UNWIND ['a', 1] AS v MATCH (f:Fighter) RETURN v",
        # alias collides with a pattern variable
        "UNWIND ['a'] AS f MATCH (f:Fighter) RETURN f",
    ):
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


# ---- size((n)-[:R]->()) degree expressions ----------------------------


def test_size_pattern_degree_expression(graph):
    """Per-row degree without grouping — `RETURN f, size((f)-[:R]->())`;
    zero-degree rows get 0, and the expression aggregates."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) "
        "RETURN f, size((f)-[:FOUGHT_IN]->(:Fight)) AS deg ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.deg) for r in out] == [("Ana", 1), ("Bo", 2), ("Cy", 1)]
    out2 = run_cypher(
        "MATCH (e:Event) RETURN e, size((e)-[:PART_OF]->()) AS outd, "
        "size((e)<-[:PART_OF]-()) AS ind",
        nodes, edges,
    ).collect()
    assert [(r.e, r.outd, r.ind) for r in out2] == [("Open 1", 0, 2)]
    out3 = run_cypher(
        "MATCH (f:Fighter) "
        "RETURN max(size((f)-[:FOUGHT_IN]->())) AS max_deg",
        nodes, edges,
    ).collect()
    assert [r.max_deg for r in out3] == [2.0]


def test_size_pattern_boundaries(graph):
    nodes, edges = graph
    for q in (
        # var-length inside size()
        "MATCH (f:Fighter) RETURN size((f)-[:FOUGHT_IN*1..2]->()) AS d",
        # both endpoints bound
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN size((f)-[:FOUGHT_IN]->(x)) AS d",
        # no bound endpoint
        "MATCH (f:Fighter) RETURN size((a)-[:PART_OF]->(b)) AS d",
    ):
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


# ---- CASE WHEN banding in RETURN --------------------------------------


def test_case_banding_and_inside_aggregate(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) "
        "RETURN CASE WHEN f.wins >= 10 THEN 'elite' "
        "WHEN f.wins >= 5 THEN 'mid' ELSE 'new' END AS band, "
        "count(*) AS n ORDER BY band",
        nodes, edges,
    ).collect()
    assert [(r.band, r.n) for r in out] == [
        ("elite", 1), ("mid", 1), ("new", 1),
    ]
    out2 = run_cypher(
        "MATCH (f:Fighter) "
        "RETURN sum(CASE WHEN f.wins >= 5 THEN 1 ELSE 0 END) AS n_vets",
        nodes, edges,
    ).collect()
    assert [r.n_vets for r in out2] == [2.0]


def test_case_no_else_yields_null_and_boundaries(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) "
        "RETURN f, CASE WHEN f.wins > 100 THEN 'gg' END AS x ORDER BY f",
        nodes, edges,
    ).collect()
    assert [(r.f, r.x) for r in out] == [
        ("Ana", None), ("Bo", None), ("Cy", None),
    ]
    for q in (
        # simple (value-matching) CASE form
        "MATCH (f:Fighter) RETURN CASE f.wins WHEN 12 THEN 'a' END AS x",
        # non-literal branch value
        "MATCH (f:Fighter) "
        "RETURN CASE WHEN f.wins > 5 THEN f.name END AS x",
    ):
        with pytest.raises(CypherUnsupported):
            run_cypher(q, nodes, edges)


def test_facade_runs_new_constructs_through_validator(spark, workdir):
    """kg.query validates (F5) then executes: UNWIND, CASE banding,
    size() degrees, and pattern predicates must all pass validation and
    run end-to-end."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[
            Entity("City", [Attribute("name", "string", True, True)]),
        ],
        relations=[Relation("ROAD", "City", "City", [])],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([("City", {"name": c}) for c in "abcd"])
    kg.add_edges([
        ("ROAD", "City", "City", {"name": s}, {"name": d})
        for s, d in [("a", "b"), ("a", "c"), ("b", "c")]
    ])
    out = kg.query(
        "UNWIND ['a', 'd', 'zz'] AS v MATCH (c:City) WHERE c.name = v "
        "RETURN v, size((c)-[:ROAD]->()) AS deg, "
        "CASE WHEN c.name = 'a' THEN 'hub' ELSE 'leaf' END AS kind "
        "ORDER BY v"
    ).collect()
    assert [(r.v, r.deg, r.kind) for r in out] == [
        ("a", 2, "hub"), ("d", 0, "leaf"),
    ]
    out2 = kg.query(
        "MATCH (c:City) WHERE NOT (c)-[:ROAD]->(:City) "
        "RETURN c ORDER BY c"
    ).collect()
    assert [r.c for r in out2] == ["c", "d"]


# ---- scalar functions in RETURN (hidden-column compilation) -----------


def test_scalar_functions_in_return(graph):
    """toLower/toUpper/toInteger/substring/coalesce each compile to one
    hidden column; substring is openCypher 0-based; the scalar alias is
    sortable (ORDER BY lo)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN toLower(f.name) AS lo, "
        "toUpper(f.name) AS up, toInteger(f.wins) AS w, "
        "substring(f.name, 0, 2) AS pfx, "
        "coalesce(f.nick, f.name) AS handle ORDER BY lo",
        nodes, edges,
    ).collect()
    assert [(r.lo, r.up, r.w, r.pfx, r.handle) for r in out] == [
        ("ana", "ANA", 12, "An", "Ana"),
        ("bo", "BO", 7, "Bo", "Bo"),
        ("cy", "CY", 3, "Cy", "Cy"),
    ]


def test_scalar_nested_and_inside_aggregates(graph):
    """Nested calls resolve innermost-first; a hidden scalar column is a
    valid aggregate argument (numeric aggs cast to double) and collect
    target."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN x AS fight, max(toInteger(f.wins)) AS best, "
        "collect(DISTINCT toUpper(trim(f.name))) AS who "
        "ORDER BY fight",
        nodes, edges,
    ).collect()
    assert [(r.fight, r.best, r.who) for r in out] == [
        ("Ana v Bo", 12.0, ["ANA", "BO"]),
        ("Bo v Cy", 7.0, ["BO", "CY"]),
    ]


def test_type_of_relationship_var(graph):
    """type(r) reads the relationship label captured by leg_df — useful
    with alternation where the matched type varies per row."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (a)-[r:FOUGHT_IN|PART_OF]->(b) "
        "RETURN type(r) AS rel, count(*) AS n ORDER BY rel",
        nodes, edges,
    ).collect()
    assert [(r.rel, r.n) for r in out] == [("FOUGHT_IN", 4), ("PART_OF", 2)]


def test_scalar_unsupported_shapes_raise(graph):
    nodes, edges = graph
    for bad in [
        "MATCH (f:Fighter) RETURN type(f) AS t",          # not a rel var
        "MATCH (f:Fighter) RETURN substring(f.name, f.wins) AS s",
        "MATCH (f:Fighter) RETURN coalesce(f.name) AS s",  # arity
        "MATCH (f:Fighter) RETURN toLower(g.name) AS s",   # unknown var
        "MATCH (f:Fighter) RETURN toLower() AS s",         # arity
    ]:
        with pytest.raises(CypherUnsupported):
            run_cypher(bad, nodes, edges)


def test_scalar_literal_commas_and_quotes_masked(graph):
    """Quoted literals containing commas/parens must not confuse the
    argument splitter (masked scan)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN coalesce(f.nick, 'n/a, (none)') AS h, "
        "f AS name ORDER BY name",
        nodes, edges,
    ).collect()
    assert [(r.h, r.name) for r in out] == [
        ("n/a, (none)", "Ana"), ("n/a, (none)", "Bo"), ("n/a, (none)", "Cy"),
    ]


# ---------------------------------------------------------- UNION [ALL]


def test_union_dedups_across_sides(graph):
    """openCypher UNION: each side a full query, same column names, rows
    deduplicated across sides."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight {title: 'Ana v Bo'}) "
        "RETURN f.name AS name "
        "UNION "
        "MATCH (f:Fighter) WHERE f.wins >= 7 RETURN f.name AS name",
        nodes, edges,
    ).collect()
    # side 1: Ana, Bo; side 2: Ana(12), Bo(7) -> dedup to 2
    assert sorted(r.name for r in out) == ["Ana", "Bo"]


def test_union_all_keeps_multiplicity(graph):
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Cy'}) RETURN f.name AS name "
        "UNION ALL "
        "MATCH (f:Fighter) WHERE f.wins < 10 RETURN f.name AS name",
        nodes, edges,
    ).collect()
    assert sorted(r.name for r in out) == ["Bo", "Cy", "Cy"]


def test_union_per_side_order_limit(graph):
    """ORDER BY/LIMIT bind to their own side (openCypher), not the union."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN f.name AS name ORDER BY name LIMIT 1 "
        "UNION "
        "MATCH (f:Fighter) RETURN f.name AS name ORDER BY name DESC LIMIT 1",
        nodes, edges,
    ).collect()
    assert sorted(r.name for r in out) == ["Ana", "Cy"]


def test_union_guards(graph):
    nodes, edges = graph
    with pytest.raises(CypherUnsupported, match="same column names"):
        run_cypher(
            "MATCH (f:Fighter) RETURN f.name AS a "
            "UNION MATCH (f:Fighter) RETURN f.name AS b",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="mixing UNION"):
        run_cypher(
            "MATCH (f:Fighter) RETURN f.name AS a "
            "UNION MATCH (f:Fighter) RETURN f.name AS a "
            "UNION ALL MATCH (f:Fighter) RETURN f.name AS a",
            nodes, edges,
        )
    # a quoted 'UNION' inside a string literal is NOT a union boundary
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.name = 'UNION' RETURN f.name AS name",
        nodes, edges,
    ).collect()
    assert out == []


def test_union_through_kg_query(spark, workdir):
    """kg.query validates both UNION sides' legs (the validator is
    leg-span based, so UNION needs no special pass-through) then
    executes the union."""
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology, Relation

    onto = Ontology(
        entities=[
            Entity("Actor", [Attribute("name", "string", True, True)]),
            Entity("Movie", [Attribute("title", "string", True, True)]),
        ],
        relations=[Relation("ACTED_IN", "Actor", "Movie", [])],
    )
    kg = KnowledgeGraph(spark, onto, workdir)
    kg.add_nodes([
        ("Actor", {"name": "Jose"}), ("Actor", {"name": "Mira"}),
        ("Movie", {"title": "Tide"}),
    ])
    kg.add_edges([
        ("ACTED_IN", "Actor", "Movie", {"name": "Jose"}, {"title": "Tide"}),
    ])
    out = kg.query(
        "MATCH (a:Actor)-[:ACTED_IN]->(m:Movie) RETURN a.name AS name "
        "UNION MATCH (a:Actor {name: 'Mira'}) RETURN a.name AS name"
    ).collect()
    assert sorted(r.name for r in out) == ["Jose", "Mira"]
    # an invalid leg on EITHER side still rejects
    with pytest.raises(ValueError, match="direction"):
        kg.query(
            "MATCH (a:Actor)-[:ACTED_IN]->(m:Movie) RETURN a.name AS name "
            "UNION MATCH (a:Actor)<-[:ACTED_IN]-(m:Movie) "
            "RETURN a.name AS name"
        )


def test_labels_and_properties_in_return(graph):
    """labels(n) = the pattern's label string (single-label model,
    documented deviation from openCypher's list); properties(n) = the
    full props map as canonical sorted-key JSON."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'}) "
        "RETURN labels(f) AS lbl, properties(f) AS props",
        nodes, edges,
    ).collect()
    assert [(r.lbl, r.props) for r in out] == [
        ("Fighter", '{"name":"Ana","wins":"12"}')
    ]
    # usable inside aggregates / grouping like any hidden column
    out = run_cypher(
        "MATCH (f:Fighter) RETURN labels(f) AS lbl, count(f) AS n",
        nodes, edges,
    ).collect()
    assert [(r.lbl, r.n) for r in out] == [("Fighter", 3)]
    with pytest.raises(CypherUnsupported, match="LABELED"):
        run_cypher("MATCH (x) RETURN labels(x) AS l", nodes, edges)
    with pytest.raises(CypherUnsupported, match="bound node variable"):
        run_cypher(
            "MATCH (f:Fighter) RETURN properties(zz) AS p", nodes, edges
        )


def test_percentile_disc(graph):
    """Neo4j/FalkorDB percentileDisc: nearest-rank ceil(p*n), 1-based,
    p=0 -> min, p=1 -> max; implicit grouping like any aggregate."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN percentileDisc(f.wins, 0.5) AS med, "
        "percentileDisc(f.wins, 0) AS lo, percentileDisc(f.wins, 1) AS hi",
        nodes, edges,
    ).collect()
    assert [(r.med, r.lo, r.hi) for r in out] == [(7.0, 3.0, 12.0)]
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "RETURN x.title AS fight, percentileDisc(f.wins, 1.0) AS best "
        "ORDER BY fight",
        nodes, edges,
    ).collect()
    assert [(r.fight, r.best) for r in out] == [
        ("Ana v Bo", 12.0), ("Bo v Cy", 7.0),
    ]
    with pytest.raises(CypherUnsupported, match=r"\[0, 1\]"):
        run_cypher(
            "MATCH (f:Fighter) RETURN percentileDisc(f.wins, 1.5) AS x",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="property"):
        run_cypher(
            "MATCH (f:Fighter) RETURN percentileDisc(f, 0.5) AS x",
            nodes, edges,
        )


def test_math_scalars_in_return(graph):
    """abs/ceil/floor/sign over try_cast-double props; toString casts;
    nesting through the hidden-column loop (toString(floor(...)))."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'}) "
        "RETURN abs(f.wins) AS a, ceil(f.wins) AS c, floor(f.wins) AS fl, "
        "sign(f.wins) AS s, toString(floor(f.wins)) AS st",
        nodes, edges,
    ).collect()
    assert [(r.a, r.c, r.fl, r.s, r.st) for r in out] == [
        (12.0, 12, 12, 1, "12")
    ]


def test_round_scalar(spark):
    """Single-arg round(): nearest integer, half away from zero
    (FalkorDB/C round parity — Spark's HALF_UP matches on exact dyadic
    ties), NULL through non-numeric, works inside aggregates."""
    nodes = spark.createDataFrame(
        [
            (1, "V", "a", {"x": "2.5", "y": "0.25"}),
            (2, "V", "b", {"x": "-2.5", "y": "1.75"}),
            (3, "V", "c", {"x": "0.49", "y": "not-a-number"}),
        ],
        "node_id bigint, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [], "src_id bigint, label string, dst_id bigint, props map<string,string>"
    )
    out = run_cypher(
        "MATCH (v:V) RETURN v AS k, round(v.x) AS rx, round(v.y) AS ry "
        "ORDER BY k",
        nodes, edges,
    ).collect()
    assert [(r.k, r.rx, r.ry) for r in out] == [
        ("a", 3.0, 0.0), ("b", -3.0, 2.0), ("c", 0.0, None),
    ]
    agg = run_cypher(
        "MATCH (v:V) RETURN sum(round(v.x)) AS s", nodes, edges
    ).collect()
    assert agg[0].s == 0.0  # 3 + (-3) + 0


def test_percentile_cont_empty_group_is_null(graph):
    """ADVICE r04: percentileCont over a group with zero non-NULL values
    must yield NULL (openCypher), not abort with INVALID_INDEX_OF_ZERO —
    try_element_at tolerates out-of-range but raises at index 0."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN percentileCont(f.nosuch, 0.5) AS p, "
        "percentileCont(f.name, 0.5) AS q",  # non-numeric: all-NULL casts
        nodes, edges,
    ).collect()
    assert [(r.p, r.q) for r in out] == [(None, None)]
    # grouped: Events carry no 'wins' prop — every group must be NULL
    out = run_cypher(
        "MATCH (e:Event) RETURN e AS k, percentileCont(e.wins, 0.25) AS p",
        nodes, edges,
    ).collect()
    assert [(r.k, r.p) for r in out] == [("Open 1", None)]


def test_union_not_triggered_by_property_named_union(graph):
    """Review fix: `n.union` is a property access, not a set operator —
    the UNION splitter must not fire on it."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.union = 'EU' RETURN f.name AS name",
        nodes, edges,
    ).collect()
    assert out == []  # no such prop: empty, but parses as ONE query


def test_unwind_after_with(graph):
    """UNWIND opens a later stage: the literal values cross-join the
    carried (aggregated) relation — the 'top-k then per-item expansion'
    shape; the alias works in RETURN and ORDER BY."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH f, count(x) AS n "
        "UNWIND ['p1', 'p2'] AS phase "
        "RETURN f, n, phase ORDER BY f, phase",
        nodes, edges,
    ).collect()
    assert [(r.f, r.n, r.phase) for r in out] == [
        ("Ana", 1, "p1"), ("Ana", 1, "p2"),
        ("Bo", 2, "p1"), ("Bo", 2, "p2"),
        ("Cy", 1, "p1"), ("Cy", 1, "p2"),
    ]
    # empty list in a later stage: zero rows (openCypher)
    out = run_cypher(
        "MATCH (f:Fighter) WITH f, f.wins AS w "
        "UNWIND [] AS z RETURN f, z",
        nodes, edges,
    ).collect()
    assert out == []


def test_percentile_cont(graph):
    """Linear interpolation at (n-1)*p: wins [3,7,12], p=0.5 -> 7.0,
    p=0.25 -> 3 + 0.5*(7-3) = 5.0, p=1 -> 12.0."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN percentileCont(f.wins, 0.5) AS med, "
        "percentileCont(f.wins, 0.25) AS q1, "
        "percentileCont(f.wins, 1) AS hi",
        nodes, edges,
    ).collect()
    assert [(r.med, r.q1, r.hi) for r in out] == [(7.0, 5.0, 12.0)]


def test_stdev_aggregate(graph):
    """Sample stdev over props: wins [3,7,12] -> mean 22/3, var
    ((9+49+144) - 22*22/3)/2 = (202 - 161.333...)/2; single-row and
    grouped; order-free decimal sums under the hood."""
    import math

    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN stDev(f.wins) AS sd",
        nodes, edges,
    ).collect()
    expect = math.sqrt((202.0 - 22.0 * 22.0 / 3) / 2)
    assert abs(out[0].sd - expect) < 1e-12
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'}) RETURN stDev(f.wins) AS sd",
        nodes, edges,
    ).collect()
    assert out[0].sd == 0.0  # single value: 0 (Neo4j parity)


def test_stats_aggregates_after_with(graph):
    """percentileDisc and stDev also run over post-WITH plain columns
    (the last-WITH namespace feeds RETURN)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WITH f.wins AS w "
        "RETURN percentileDisc(w, 0.5) AS med, stDev(w) AS sd",
        nodes, edges,
    ).collect()
    import math

    assert out[0].med == 7.0
    assert abs(out[0].sd - math.sqrt((202.0 - 22.0 * 22.0 / 3) / 2)) < 1e-12


def test_string_and_id_scalars(graph):
    """r5 scalars: toBoolean / replace / left / right / id — hidden
    columns, nestable, NULL-through on non-matching toBoolean."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'}) "
        "RETURN replace(f.name, 'na', 'NA') AS rep, "
        "left(f.name, 2) AS l2, right(f.name, 2) AS r2, "
        "toBoolean(f.name) AS tb, id(f) AS nid",
        nodes, edges,
    ).collect()
    assert [(r.rep, r.l2, r.r2, r.tb, r.nid) for r in out] == [
        ("ANA", "An", "na", None, 1)
    ]
    out2 = run_cypher(
        "MATCH (f:Fighter) WHERE f.name = 'Bo' "
        "RETURN toBoolean('TRUE') AS t, toBoolean(' false ') AS f2, "
        "replace(toUpper(f.name), 'O', '0') AS nested",
        nodes, edges,
    ).collect()
    assert [(r.t, r.f2, r.nested) for r in out2] == [(True, False, "B0")]
    with pytest.raises(CypherUnsupported, match="left"):
        run_cypher(
            "MATCH (f:Fighter) RETURN left(f.name, f.wins) AS x",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="id"):
        run_cypher(
            "MATCH (f:Fighter)-[r:FOUGHT_IN]->(x:Fight) "
            "RETURN id(zz) AS i", nodes, edges,
        )


def test_string_size_sqrt_keys_scalars(graph):
    """r5 batch 2: lTrim/rTrim/reverse/size(string)/sqrt/keys. size()
    with a property arg is the STRING-length scalar; the size(r)
    hop-count and size(pattern) degree forms keep their own compilers
    (guarded by _SIZE_SCALAR_RE's argument shape)."""
    import math

    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter {name: 'Ana'}) "
        "RETURN lTrim('  x ') AS lt, rTrim('  x ') AS rt, "
        "reverse(f.name) AS rev, size(f.name) AS n, "
        "sqrt(f.wins) AS root, keys(f) AS ks",
        nodes, edges,
    ).collect()
    assert [tuple(r) for r in out] == [
        ("x ", "  x", "anA", 3, math.sqrt(12.0), '["name","wins"]')
    ]
    # nested: size over a scalar result's source prop, sqrt of literal
    out2 = run_cypher(
        "MATCH (f:Fighter {name: 'Bo'}) "
        "RETURN size(toUpper(f.name)) AS n2, sqrt(4) AS two",
        nodes, edges,
    ).collect()
    assert [tuple(r) for r in out2] == [(2, 2.0)]
    # the degree form still compiles (not consumed by the string scalar)
    out3 = run_cypher(
        "MATCH (f:Fighter) RETURN f.name AS nm, "
        "size((f)-[:FOUGHT_IN]->()) AS deg ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [(r.nm, r.deg) for r in out3] == [("Ana", 1), ("Bo", 2), ("Cy", 1)]
    with pytest.raises(CypherUnsupported, match="keys"):
        run_cypher(
            "MATCH (f:Fighter) RETURN keys(zz) AS k", nodes, edges
        )


def test_call_db_introspection(graph):
    """Standalone CALL db.labels() / db.relationshipTypes() /
    db.propertyKeys(): distributed DISTINCTs over the graph tables,
    optional YIELD (must name the canonical column), optional RETURN
    alias, ORDER BY / SKIP / LIMIT."""
    nodes, edges = graph
    labels = run_cypher(
        "CALL db.labels() YIELD label RETURN label ORDER BY label",
        nodes, edges,
    ).collect()
    assert [r.label for r in labels] == ["Event", "Fight", "Fighter"]
    rels = run_cypher("CALL db.relationshipTypes()", nodes, edges).collect()
    assert sorted(r.relationshipType for r in rels) == [
        "FOUGHT_IN", "PART_OF"
    ]
    pk = run_cypher(
        "CALL db.propertyKeys() YIELD propertyKey "
        "RETURN propertyKey AS pk ORDER BY pk DESC LIMIT 3",
        nodes, edges,
    ).collect()
    assert [r.pk for r in pk] == ["wins", "title", "rounds"]
    skipped = run_cypher(
        "CALL db.labels() YIELD label RETURN label "
        "ORDER BY label SKIP 1 LIMIT 1",
        nodes, edges,
    ).collect()
    assert [r.label for r in skipped] == ["Fight"]
    with pytest.raises(CypherUnsupported, match="yields"):
        run_cypher("CALL db.labels() YIELD name", nodes, edges)
    with pytest.raises(CypherUnsupported, match="ORDER BY"):
        run_cypher(
            "CALL db.labels() YIELD label RETURN label ORDER BY zz",
            nodes, edges,
        )


@pytest.fixture(scope="module")
def ring_graph(spark):
    """4-ring A-B-C-D-A, weight-1 edges both directions (two simple
    paths per ordered pair)."""
    names = ["A", "B", "C", "D"]
    ids = {n: i + 1 for i, n in enumerate(names)}
    nodes = spark.createDataFrame(
        [(ids[n], "N", n, {"name": n}) for n in names],
        "node_id long, label string, key string, props map<string,string>",
    )
    ring = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")]
    rows = []
    for s, d in ring:
        rows.append((ids[s], "R", ids[d], {"w": "1"}))
        rows.append((ids[d], "R", ids[s], {"w": "1"}))
    edges = spark.createDataFrame(
        rows, "src_id long, label string, dst_id long, props map<string,string>"
    )
    return nodes.cache(), edges.cache()


def test_call_sppaths_pathcount_topk(ring_graph):
    """pathCount: 2 yields the two cheapest simple paths per pair with
    deterministic routes; self-pairs have only the empty walk."""
    nodes, edges = ring_graph
    out = run_cypher(
        "MATCH (a:N {name: 'A'}), (b:N) "
        "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
        "relTypes: ['R'], weightProp: 'w', maxLen: 3, pathCount: 2}) "
        "YIELD pathWeight, path "
        "RETURN b AS dst, pathWeight, path "
        "ORDER BY dst, pathWeight, path",
        nodes, edges,
    ).collect()
    assert [(r.dst, r.pathWeight, r.path) for r in out] == [
        ("A", 0.0, "A"),
        ("B", 1.0, "A->B"),
        ("B", 3.0, "A->D->C->B"),
        ("C", 2.0, "A->B->C"),
        ("C", 2.0, "A->D->C"),
        ("D", 1.0, "A->D"),
        ("D", 3.0, "A->B->C->D"),
    ]
    # SSpaths with pathCount, weights only (k rows per destination)
    ss = run_cypher(
        "MATCH (a:N {name: 'A'}) "
        "CALL algo.SSpaths({sourceNode: a, relTypes: ['R'], "
        "weightProp: 'w', maxLen: 3, pathCount: 2}) YIELD pathWeight "
        "RETURN count(*) AS n, sum(pathWeight) AS tot",
        nodes, edges,
    ).collect()
    assert (ss[0].n, ss[0].tot) == (6, 12.0)
    with pytest.raises(CypherUnsupported, match="pathCount"):
        run_cypher(
            "MATCH (a:N {name: 'A'}), (b:N) "
            "CALL algo.SPpaths({sourceNode: a, targetNode: b, "
            "pathCount: 0}) YIELD pathWeight RETURN pathWeight",
            nodes, edges,
        )


def test_start_end_node_scalars(movie_graph):
    """startNode(r)/endNode(r) (r5): the endpoint node's key, directed
    single-hop rel vars only."""
    nodes, edges = movie_graph
    out = run_cypher(
        "MATCH (a:Person)-[r:ACTED_IN]->(m:Movie) "
        "RETURN startNode(r) AS s, endNode(r) AS e, type(r) AS t "
        "ORDER BY s, e",
        nodes, edges,
    ).collect()
    assert all(r.t == "ACTED_IN" for r in out)
    pairs = run_cypher(
        "MATCH (a:Person)-[r:ACTED_IN]->(m:Movie) "
        "RETURN a AS s2, m AS e2 ORDER BY s2, e2",
        nodes, edges,
    ).collect()
    assert [(r.s, r.e) for r in out] == [(p.s2, p.e2) for p in pairs]
    with pytest.raises(CypherUnsupported, match="undirected"):
        run_cypher(
            "MATCH (a:Person)-[r:ACTED_IN]-(m:Movie) "
            "RETURN startNode(r) AS s", nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="startNode"):
        run_cypher(
            "MATCH (a:Person) RETURN startNode(zz) AS s", nodes, edges
        )


def test_unwind_range(graph):
    """UNWIND range(a, b[, step]) (r5): end-inclusive, negative step,
    empty range -> zero rows; values join the numeric-alias path."""
    nodes, edges = graph
    out = run_cypher(
        "UNWIND range(1, 3) AS i MATCH (f:Fighter) "
        "RETURN i, count(*) AS n ORDER BY i",
        nodes, edges,
    ).collect()
    assert [(r.i, r.n) for r in out] == [(1.0, 3), (2.0, 3), (3.0, 3)]
    down = run_cypher(
        "UNWIND range(5, 1, -2) AS i MATCH (f:Fighter {name: 'Ana'}) "
        "RETURN i ORDER BY i",
        nodes, edges,
    ).collect()
    assert [r.i for r in down] == [1.0, 3.0, 5.0]
    empty = run_cypher(
        "UNWIND range(5, 1) AS i MATCH (f:Fighter) RETURN i",
        nodes, edges,
    ).collect()
    assert empty == []
    # alias equi-join: wins prop matches the range value
    j = run_cypher(
        "UNWIND range(3, 12, 9) AS w MATCH (f:Fighter) "
        "WHERE f.wins = w RETURN f.name AS nm, w ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [(r.nm, r.w) for r in j] == [("Ana", 12.0), ("Cy", 3.0)]
    with pytest.raises(CypherUnsupported, match="step"):
        run_cypher(
            "UNWIND range(1, 3, 0) AS i MATCH (f:Fighter) RETURN i",
            nodes, edges,
        )


def test_arithmetic_in_return(graph):
    """r5 arithmetic: precedence, parens, unary minus, division;
    aggregates over arithmetic; guards (alias required, post-agg
    arithmetic out)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) RETURN f.name AS nm, "
        "f.wins * 2 + 1 AS a, (f.wins + 1) / 2 AS b, "
        "-f.wins + 100 AS c ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [(r.nm, r.a, r.b, r.c) for r in out] == [
        ("Ana", 25.0, 6.5, 88.0),
        ("Bo", 15.0, 4.0, 93.0),
        ("Cy", 7.0, 2.0, 97.0),
    ]
    agg = run_cypher(
        "MATCH (f:Fighter) RETURN sum(f.wins * f.wins) AS ss, "
        "avg(f.wins - 1) AS m, count(*) AS n",
        nodes, edges,
    ).collect()[0]
    assert (agg.ss, agg.m, agg.n) == (144.0 + 49.0 + 9.0, 19.0 / 3, 3)
    # composition: scalar output feeds arithmetic (hidden-col atom)
    nested = run_cypher(
        "MATCH (f:Fighter {name: 'Cy'}) "
        "RETURN sqrt(f.wins) * 2 + 1 AS s",
        nodes, edges,
    ).collect()
    assert [r.s for r in nested] == [2 * 3.0 ** 0.5 + 1]
    # arithmetic INSIDE a scalar call raises loudly (strict prop
    # check) instead of silently reading a garbage map key -> NULL
    with pytest.raises(CypherUnsupported, match="scalar-function"):
        run_cypher(
            "MATCH (f:Fighter) RETURN sqrt(f.wins + 9) AS s",
            nodes, edges,
        )
    with pytest.raises(CypherUnsupported, match="unsupported return"):
        run_cypher(
            "MATCH (f:Fighter) RETURN sum(f.wins) * 2 AS x", nodes, edges
        )
    with pytest.raises(CypherUnsupported, match="unsupported return"):
        run_cypher(
            "MATCH (f:Fighter) RETURN f.wins + 1", nodes, edges
        )


def test_arithmetic_in_where(graph):
    """r5: arithmetic comparisons in WHERE compile through the shared
    grammar into the segment's single Catalyst Filter."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WHERE f.wins * 2 > 10 "
        "RETURN f.name AS nm ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [r.nm for r in out] == ["Ana", "Bo"]
    both = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WHERE f.wins + 1 <= x.rounds * 2 "
        "RETURN f.name AS nm, x.title AS t ORDER BY nm, t",
        nodes, edges,
    ).collect()
    # Ana(12)+1 <= 3*2? no. Bo(7)+1 <= 6/10? AnaVBo rounds 3 -> 8<=6 no;
    # BoVCy rounds 5 -> 8<=10 yes. Cy(3)+1 <= 10 yes.
    assert [(r.nm, r.t) for r in both] == [
        ("Bo", "Bo v Cy"), ("Cy", "Bo v Cy")
    ]
    # boolean composition + parens still one WHERE
    comp = run_cypher(
        "MATCH (f:Fighter) WHERE (f.wins - 1) / 2 >= 3 OR f.name = 'Cy' "
        "RETURN f.name AS nm ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [r.nm for r in comp] == ["Ana", "Bo", "Cy"]
    with pytest.raises(CypherUnsupported, match="unsupported condition"):
        run_cypher(
            "MATCH (f:Fighter) WHERE f.wins * 2 > f.name CONTAINS 'x' "
            "RETURN f.name AS nm", nodes, edges,
        )


def test_arithmetic_at_with_boundaries(graph):
    """r5: arithmetic in WITH — plain-columns mode (last WITH before
    RETURN, HAVING over agg-of-arith) and carry mode (computed column
    rides into a later MATCH stage)."""
    nodes, edges = graph
    out = run_cypher(
        "MATCH (f:Fighter) WITH f.name AS nm, f.wins * 2 + 1 AS odd "
        "WHERE odd > 10 RETURN nm, odd ORDER BY nm",
        nodes, edges,
    ).collect()
    assert [(r.nm, r.odd) for r in out] == [("Ana", 25.0), ("Bo", 15.0)]
    agg = run_cypher(
        "MATCH (f:Fighter)-[:FOUGHT_IN]->(x:Fight) "
        "WITH x AS fight, sum(f.wins - 1) AS adj "
        "MATCH (fight)-[:PART_OF]->(e:Event) "
        "RETURN e AS ev, sum(adj) AS tot",
        nodes, edges,
    ).collect()
    # Ana v Bo: (12-1)+(7-1)=17; Bo v Cy: (7-1)+(3-1)=8; both -> Open 1
    assert [(r.ev, r.tot) for r in agg] == [("Open 1", 25.0)]


def test_with_distinct_collapses_before_aggregate(spark):
    """WITH DISTINCT (r5 s8): dedup happens at the boundary, so a
    downstream count sees the collapsed relation; without DISTINCT the
    same query counts multiplicities."""
    nodes = spark.createDataFrame(
        [(1, "P", "a", {"city": "X"}), (2, "P", "b", {"city": "X"}),
         (3, "P", "c", {"city": "Y"})],
        "node_id long, label string, key string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [], "src_id long, label string, dst_id long, props map<string,string>"
    )
    from kgforge.plans.cypher_exec import run_cypher

    dedup = run_cypher(
        "MATCH (p:P) WITH DISTINCT p.city AS city RETURN count(city) AS n",
        nodes, edges,
    ).collect()
    assert [tuple(r) for r in dedup] == [(2,)]
    keep = run_cypher(
        "MATCH (p:P) WITH p.city AS city RETURN count(city) AS n",
        nodes, edges,
    ).collect()
    assert [tuple(r) for r in keep] == [(3,)]
    rows = run_cypher(
        "MATCH (p:P) WITH DISTINCT p.city AS city RETURN city ORDER BY city",
        nodes, edges,
    ).collect()
    assert [r.city for r in rows] == ["X", "Y"]
