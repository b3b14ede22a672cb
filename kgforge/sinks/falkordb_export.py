"""FalkorDB-compatible export of the materialized property graph.

The reference writes the graph by issuing one Cypher MERGE per entity and
one MATCH-MATCH-MERGE per relation
(/root/reference/graphrag_sdk/steps/extract_data_step.py:222,266), rendering
property dicts with `map_dict_to_cypher_properties`
(helpers.py:22-49): keys unquoted, string values double-quoted with
unescaped quotes escaped (helpers.py:35-43), `None` -> "" (helpers.py:44-46).

This sink renders the same statements as a DataFrame column — pure built-in
expressions (regexp_replace with look-behind for the escaping rule, no
Python) — so an exported file can be replayed into FalkorDB verbatim, or the
graph bulk-loaded from the node/edge CSVs. At scale the statements are
written partition-parallel (one file per partition); a graph DB ingest is
the bottleneck, not the render.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# helpers.py:38-41: escape double quotes not already escaped
_UNESCAPED_QUOTE = r'(?<!\\)"'


def cypher_value(v: Column) -> Column:
    """Render one property value as the reference does: None -> \"\",
    everything else double-quoted with unescaped quotes escaped.

    (The pipeline's property bags are map<string,string>; the reference
    renders non-string scalars unquoted, but it receives them as strings
    post-JSON too — fidelity target is helpers.py:31-46.)
    """
    escaped = F.regexp_replace(v, _UNESCAPED_QUOTE, '\\\\"')
    return F.when(v.isNull(), F.lit('""')).otherwise(
        F.concat(F.lit('"'), escaped, F.lit('"'))
    )


def cypher_props(props: Column) -> Column:
    """map<string,string> -> `{k1: "v1", k2: "v2"}` in key-sorted order.

    The reference emits dict order (insertion order of the parsed JSON);
    key-sorted rendering makes the export deterministic under parallelism —
    FalkorDB MERGE semantics are order-insensitive.
    """
    entries = F.array_sort(F.map_entries(props))
    rendered = F.transform(
        entries,
        lambda e: F.concat(e.key, F.lit(": "), cypher_value(e.value)),
    )
    return F.concat(F.lit("{"), F.concat_ws(", ", rendered), F.lit("}"))


def node_statements(nodes: DataFrame, key_attr_by_label: dict[str, str]) -> DataFrame:
    """nodes(node_id, label, key, props) -> (node_id, stmt).

    stmt = `MERGE (n:Label {key_attr: "key"}) SET n += {props...}` — the
    exact shape of extract_data_step.py:222 with the unique attribute as the
    MERGE key and the remaining properties in the SET.
    """
    key_attr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in key_attr_by_label]),
            F.array(*[F.lit(v) for v in key_attr_by_label.values()]),
        ),
        F.col("label"),
    ) if key_attr_by_label else F.lit(None).cast("string")
    non_key = F.map_filter(
        F.col("props"), lambda k, _: k != F.coalesce(key_attr, F.lit(""))
    )
    stmt = F.concat(
        F.lit("MERGE (n:"),
        F.col("label"),
        F.lit(" {"),
        F.coalesce(key_attr, F.lit("key")),
        F.lit(": "),
        cypher_value(F.col("key")),
        F.lit("}) SET n += "),
        cypher_props(non_key),
    )
    return nodes.select("node_id", stmt.alias("stmt"))


def edge_statements(edges: DataFrame, key_attr_by_label: dict[str, str]) -> DataFrame:
    """edges(src_id, label, dst_id, props, src_label, src_key, dst_label,
    dst_key) -> (src_id, dst_id, stmt), MATCH-MATCH-MERGE shape of
    extract_data_step.py:266."""
    def keyed(label_col: str, key_col: str) -> Column:
        ka = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in key_attr_by_label]),
                F.array(*[F.lit(v) for v in key_attr_by_label.values()]),
            ),
            F.col(label_col),
        ) if key_attr_by_label else F.lit(None).cast("string")
        return F.concat(
            F.lit("{"),
            F.coalesce(ka, F.lit("key")),
            F.lit(": "),
            cypher_value(F.col(key_col)),
            F.lit("}"),
        )

    stmt = F.concat(
        F.lit("MATCH (s:"), F.col("src_label"), F.lit(" "),
        keyed("src_label", "src_key"),
        F.lit(") MATCH (d:"), F.col("dst_label"), F.lit(" "),
        keyed("dst_label", "dst_key"),
        F.lit(") MERGE (s)-[r:"), F.col("label"),
        F.lit("]->(d) SET r += "), cypher_props(F.col("props")),
    )
    return edges.select("src_id", "dst_id", stmt.alias("stmt"))


def export_cypher(
    nodes: DataFrame,
    edges: DataFrame,
    key_attr_by_label: dict[str, str],
    out_dir: str,
) -> None:
    """Write replayable .cypher text files: nodes first, then edges
    (endpoint MATCH requires nodes to exist, mirroring the reference's
    per-document ordering at extract_data_step.py:177-189)."""
    node_statements(nodes, key_attr_by_label).select("stmt").write.mode(
        "overwrite"
    ).text(f"{out_dir}/nodes.cypher")
    edge_statements(edges, key_attr_by_label).select("stmt").write.mode(
        "overwrite"
    ).text(f"{out_dir}/edges.cypher")
