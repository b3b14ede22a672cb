"""Iceberg MERGE INTO surface: SQL generation + catalog gating (this
container ships no Iceberg runtime jar, so execution is exercised only
when a catalog is configured; semantics parity with the parquet path is
pinned by the shared overlay expression)."""

from __future__ import annotations

import pytest

from kgforge.sinks.iceberg import (
    iceberg_catalogs,
    merge_edges_sql,
    merge_nodes_sql,
)


def test_merge_nodes_sql_shape():
    sql = merge_nodes_sql("glue.kg.nodes", "src")
    assert sql.startswith("MERGE INTO glue.kg.nodes t USING src s")
    assert "ON t.node_id = s.node_id" in sql
    # SET += overlay: old keys filtered before concat (mapKeyDedupPolicy)
    assert "map_filter(t.props" in sql and "map_concat(" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_merge_edges_sql_shape():
    sql = merge_edges_sql("glue.kg.edges", "src")
    assert "ON t.src_id = s.src_id AND t.label = s.label AND t.dst_id = s.dst_id" in sql
    assert "UPDATE SET t.props" in sql


def test_no_catalog_detected_in_this_container(spark):
    assert iceberg_catalogs(spark) == []


def test_kg_requires_catalog_for_iceberg_tables(spark, workdir):
    from kgforge.kg import KnowledgeGraph
    from kgforge.ontology import Attribute, Entity, Ontology

    onto = Ontology(
        entities=[Entity("A", [Attribute("id", "string", True, True)])],
        relations=[],
    )
    with pytest.raises(ValueError, match="Iceberg catalog"):
        KnowledgeGraph(
            spark, onto, workdir, iceberg_tables=("c.kg.nodes", "c.kg.edges")
        )


def test_runtime_set_catalog_detected(spark):
    """Catalogs registered AFTER session start via spark.conf.set must be
    visible (ADVICE r02: getConf() is a creation-time snapshot)."""
    key = "spark.sql.catalog.rt_test"
    spark.conf.set(key, "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert "rt_test" in iceberg_catalogs(spark)
    finally:
        spark.conf.unset(key)
    assert "rt_test" not in iceberg_catalogs(spark)
