"""Parquet join-rewrite <-> Iceberg MERGE INTO semantic equivalence
(VERDICT r02 #6). No Iceberg runtime ships in this container, but the MERGE
statements' semantics are fully determined by their matched / not-matched
routing plus the `_OVERLAY` props expression — and `_OVERLAY` is plain
Spark SQL, executable on a joined frame without any Iceberg jar. These
hypothesis tests replay random batch sequences through BOTH code paths:

- facade path: `KnowledgeGraph.add_nodes` / `add_edges` (parquet rewrite);
- simulated MERGE: the literal `_OVERLAY` text from `sinks/iceberg.py`
  applied with MERGE's matched/unmatched routing (first batch = CREATE,
  like `_merge` does);

and assert identical final tables for every sequence.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kgforge.kg import KnowledgeGraph
from kgforge.ontology import Attribute, Entity, Ontology, Relation
from kgforge.sinks.iceberg import _OVERLAY

IDS = ["x0", "x1", "x2"]
PROP_KEYS = ["p", "q", "r"]

node_row = st.tuples(
    st.sampled_from(IDS),
    st.dictionaries(
        st.sampled_from(PROP_KEYS), st.text(max_size=4), max_size=3
    ),
)
node_batches = st.lists(
    st.lists(node_row, min_size=1, max_size=4), min_size=1, max_size=3
)


def _simulate_merge(spark, target, batch, on_cols):
    """Apply one MERGE INTO step using the exact _OVERLAY expression."""
    if target is None:
        return batch  # first write: writeTo(...).create() per iceberg._merge
    target.createOrReplaceTempView("t_sim")
    batch.createOrReplaceTempView("s_sim")
    on = " AND ".join(f"t.{c} = s.{c}" for c in on_cols)
    cols = target.columns
    keep = ", ".join(f"t.{c}" for c in cols if c != "props")
    matched = spark.sql(
        f"SELECT {keep}, {_OVERLAY} AS props "
        f"FROM t_sim t JOIN s_sim s ON {on}"
    ).select(*cols)
    unmatched_target = spark.sql(
        f"SELECT t.* FROM t_sim t ANTI JOIN s_sim s ON {on}"
    )
    inserted = spark.sql(
        f"SELECT s.* FROM s_sim s ANTI JOIN t_sim t ON {on}"
    ).select(*cols)
    return (
        unmatched_target.unionByName(matched).unionByName(inserted)
        .localCheckpoint()
    )


def _rows(df, keycols):
    return {
        tuple(getattr(r, c) for c in keycols)
        + (frozenset((r.props or {}).items()),)
        for r in df.collect()
    }


def _onto():
    return Ontology(
        entities=[
            Entity(
                "Thing",
                [Attribute("id", "string", True, True)]
                + [Attribute(k, "string", False, False) for k in PROP_KEYS],
            )
        ],
        relations=[
            Relation(
                "LINKS", "Thing", "Thing",
                [Attribute(k, "string", False, False) for k in PROP_KEYS],
            )
        ],
    )


@given(batches=node_batches)
@settings(max_examples=6, deadline=None)
def test_node_upsert_equals_merge_into(spark, tmp_path_factory, batches):
    out = str(tmp_path_factory.mktemp("merge_eq"))
    kg = KnowledgeGraph(spark, _onto(), out)
    sim = None
    for batch in batches:
        rows = [("Thing", {"id": i, **props}) for i, props in batch]
        kg.add_nodes(rows)
        sim = _simulate_merge(spark, sim, kg._node_batch(rows), ["node_id"])
    assert _rows(kg.nodes(), ["node_id", "label", "key"]) == _rows(
        sim, ["node_id", "label", "key"]
    )
    kg.delete()


@given(batches=node_batches)
@settings(max_examples=6, deadline=None)
def test_edge_upsert_equals_merge_into(spark, tmp_path_factory, batches):
    out = str(tmp_path_factory.mktemp("merge_eq_e"))
    kg = KnowledgeGraph(spark, _onto(), out)
    kg.add_nodes([("Thing", {"id": i}) for i in IDS + ["y"]])
    nodes = kg.nodes().localCheckpoint()
    sim = None
    keycols = ["src_id", "label", "dst_id"]
    for batch in batches:
        rows = [
            ("LINKS", "Thing", "Thing", {"id": i}, {"id": "y"}, props)
            for i, props in batch
        ]
        kg.add_edges(rows)
        sim = _simulate_merge(
            spark, sim, kg._edge_batch(kg._edge_keyed(rows), nodes), keycols
        )
    assert _rows(kg.edges(), keycols) == _rows(sim, keycols)
    kg.delete()
