"""Connected-components canonicalization (hash-to-min), SURVEY §2.3 J9.

A consequence of the reference's MERGE-on-unique-key semantics
(/root/reference/graphrag_sdk/steps/extract_data_step.py:222): all surface
forms of one real-world entity must collapse to one node id. Alias clusters
found by link.py close transitively here.

Hash-to-min over DataFrames: each vertex takes the minimum component id in
its neighborhood, then a pointer-jumping shortcut (component <-
component[component]) halves the remaining path each round, giving O(log n)
iterations overall. Per-iteration ``localCheckpoint`` truncates the
lineage chain so the plan does not grow with iterations — the standard Spark
iterative-algorithm hygiene (SURVEY §4).

Alias clusters are stars/short chains (diameter <= ~4), so this converges in
2-3 rounds; `max_iter` guards pathological inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 15,
) -> DataFrame:
    """vertices(id long), edges(src long, dst long) -> (id, component).

    component = min vertex id of the connected component.
    """
    # symmetrize once; dedup to bound join width
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    comp = vertices.select(
        F.col("id"), F.col("id").alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        # min component among neighbors
        nbr_min = (
            sym.join(comp, on=[sym.dst == comp.id])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = comp.join(nbr_min, on=[comp.id == nbr_min.src], how="left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer jumping: component <- component[component]; turns the
        # O(diameter) min-propagation into O(log n) total iterations
        mapping = stepped.select(
            F.col("id").alias("cid"), F.col("component").alias("cc")
        )
        new_comp = (
            stepped.join(mapping, stepped.component == mapping.cid, how="left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("cc"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    sym.unpersist()
    return comp


def survivorship(
    df: DataFrame,
    cluster_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Golden-record resolution over matched clusters: one row per
    cluster with each attribute resolved INDEPENDENTLY by majority vote
    over its non-null values, ties broken by the value's natural order
    (smallest wins) — fully deterministic, so the driver gate replays
    it in SQL. Returns (cluster_col, n_members, *attr_cols).

    The last mile of entity resolution: after blocking/matching
    (link.py, phonetic.fuzzy_join) and transitive clustering
    (connected_components above), the cluster's member records must
    collapse to ONE canonical row. Majority-with-deterministic-ties is
    the survivorship rule that needs no per-source trust model.

    Shape: per attribute one (cluster, value) count + window top-1 over
    a two-column projection, then cluster-keyed joins of the tiny
    resolved tables — k attributes cost k cheap passes, never a row
    explosion; an all-NULL attribute resolves to NULL (left join)."""
    from pyspark.sql import Window

    base = df.select(cluster_col, *attr_cols)
    out = base.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("n_members")
    )
    for a in attr_cols:
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("__c").desc(), F.col(a).asc()
        )
        top = (
            base.select(cluster_col, a)
            .where(F.col(a).isNotNull())
            .groupBy(cluster_col, a)
            .agg(F.count("*").alias("__c"))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(cluster_col, a)
        )
        out = out.join(top, on=cluster_col, how="left")
    return out
