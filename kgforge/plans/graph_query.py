"""Graph query surface over the materialized property graph (EP3).

The reference answers questions by LLM-generating Cypher against FalkorDB
(/root/reference/graphrag_sdk/steps/graph_query_step.py:40-82); its documented
Cypher surface includes MATCH patterns, variable-length paths and
shortestPath (fixtures/prompts.py:366-406). NL->query generation is out of
engine scope; the *query execution* surface is Spark SQL over the
`nodes`/`edges` tables plus these traversal helpers:

- `match_edges`: the MATCH (a:L1)-[:R]->(b:L2) pattern — label-filtered
  equi-joins, fully Catalyst-planned.
- `k_hop`: the frontier of nodes exactly/within k hops of a source set.
- `bfs_distances`: single-source shortest hop-distance (shortestPath
  parity), bounded depth — iterative frontier joins, `localCheckpoint` per
  round to truncate lineage, early exit when the frontier drains.

Distance semantics match a recursive-SQL BFS (driver_queries.py::
graph_bfs_distances carries the DuckDB WITH RECURSIVE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_edges(
    nodes: DataFrame,
    edges: DataFrame,
    src_label: str | None = None,
    rel_label: str | None = None,
    dst_label: str | None = None,
) -> DataFrame:
    """MATCH (a:src_label)-[:rel_label]->(b:dst_label) over the graph tables.

    nodes(node_id, label, key, props), edges(src_id, label, dst_id, props).
    Returns (src_key, rel, dst_key, props).
    """
    e = edges
    if rel_label is not None:
        e = e.filter(F.col("label") == rel_label)
    out = e.select(
        "src_id", F.col("label").alias("rel"), "dst_id", "props"
    )
    src = nodes.select(
        F.col("node_id").alias("src_id"),
        F.col("label").alias("_sl"),
        F.col("key").alias("src_key"),
    )
    dst = nodes.select(
        F.col("node_id").alias("dst_id"),
        F.col("label").alias("_dl"),
        F.col("key").alias("dst_key"),
    )
    if src_label is not None:
        src = src.filter(F.col("_sl") == src_label)
    if dst_label is not None:
        dst = dst.filter(F.col("_dl") == dst_label)
    return (
        out.join(src, on="src_id")
        .join(dst, on="dst_id")
        .select("src_key", "rel", "dst_key", "props")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """(src, dst) -> undirected distinct edge set."""
    return (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates(["src", "dst"])
    )


def bfs_distances(
    edges: DataFrame, sources: DataFrame, max_depth: int = 4
) -> DataFrame:
    """Single-source(-set) BFS: (id, dist) with dist = min hops <= max_depth.

    edges(src long, dst long) directed (symmetrize() first for undirected);
    sources(id long). One frontier-expansion join per level; visited set
    kept small (id, dist); `localCheckpoint` truncates the growing lineage
    exactly like the CC loop (SURVEY §4 iterative hygiene).
    """
    visited = sources.select(
        F.col("id"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint()
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, on=[frontier.id == edges.src])
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
            .join(visited.select("id"), on="id", how="left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def k_hop(
    edges: DataFrame, sources: DataFrame, k: int, exactly: bool = False
) -> DataFrame:
    """Nodes within (or at exactly) k hops of the source set."""
    dists = bfs_distances(edges, sources, max_depth=k)
    if exactly:
        return dists.filter(F.col("dist") == k).select("id")
    return dists.select("id", "dist")
