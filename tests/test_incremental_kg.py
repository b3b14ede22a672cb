"""Incremental construction: two-batch streaming ingest + rematerialize
equals the one-shot batch graph, and a later batch's alias merges an
earlier batch's node (the MERGE-idempotence property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.kg import KnowledgeGraph
from kgforge.sources.pages import corpus_to_spark, generate_corpus, movies_ontology


def _write_chunk(spark, pages_rows, schema, path):
    spark.createDataFrame(pages_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_two_batch_ingest_equals_one_shot(spark, workdir):
    corpus = generate_corpus(n_pages=30, seed=42)
    pages, _, _ = corpus_to_spark(spark, corpus)
    rows = pages.collect()

    inc_dir = f"{workdir}/pages_inc"
    kg = KnowledgeGraph(spark, movies_ontology(), f"{workdir}/inc_graph")
    _write_chunk(spark, rows[:16], pages.schema, f"{inc_dir}/b1")
    kg.ingest_incremental(inc_dir)
    kg.rematerialize()
    n_nodes_b1 = kg.nodes().count()

    _write_chunk(spark, rows[16:], pages.schema, f"{inc_dir}/b2")
    kg.ingest_incremental(inc_dir)
    out = kg.rematerialize()
    assert out["nodes"].count() > 0

    # one-shot reference graph over the same pages
    kg_full = KnowledgeGraph(spark, movies_ontology(), f"{workdir}/full_graph")
    full = kg_full.process_pages(pages)

    def tset(edges):
        return {
            (r.src_label, r.src_key, r.label, r.dst_label, r.dst_key)
            for r in edges.select(
                "src_label", "src_key", "label", "dst_label", "dst_key"
            ).collect()
        }

    assert tset(out["edges"]) == tset(full["edges"])
    assert kg.nodes().count() == full["nodes"].count()
    assert kg.nodes().count() >= n_nodes_b1  # graph only grew


def test_late_alias_merges_earlier_node(spark, workdir):
    """Batch 1 has only 'R. Takahashi'; batch 2 states the full name.
    After re-materialization they are ONE node (global re-linking)."""
    import datetime as dt

    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    ts = dt.datetime(2024, 1, 1)
    b1 = [("https://h/1", ts, None,
           "R. Takahashi acted in The Velvet Quarry.", "en")]
    b2 = [("https://h/2", ts, None,
           "Rosa Takahashi is a Person. Rosa Takahashi directed The Velvet Quarry.",
           "en")]
    inc_dir = f"{workdir}/pages_inc2"
    kg = KnowledgeGraph(spark, movies_ontology(), f"{workdir}/alias_graph")
    _write_chunk(spark, b1, schema, f"{inc_dir}/b1")
    kg.ingest_incremental(inc_dir)
    kg.rematerialize()
    keys1 = {r.key for r in kg.nodes().filter(F.col("label") == "Person").collect()}
    assert keys1 == {"R. Takahashi"}

    _write_chunk(spark, b2, schema, f"{inc_dir}/b2")
    kg.ingest_incremental(inc_dir)
    kg.rematerialize()
    keys2 = {r.key for r in kg.nodes().filter(F.col("label") == "Person").collect()}
    assert keys2 == {"Rosa Takahashi"}  # earlier node re-canonicalized
    # and the earlier ACTED_IN edge now hangs off the merged node
    acted = kg.match("Person", "ACTED_IN", "Movie").collect()
    assert {(r.src_key, r.dst_key) for r in acted} == {
        ("Rosa Takahashi", "The Velvet Quarry")
    }
