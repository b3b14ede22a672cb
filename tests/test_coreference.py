"""Page-local coreference: ambiguous abbreviations resolve per document."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.operators.link import page_local_coreference


def test_ambiguous_abbreviation_resolves_per_page(spark):
    """"Alan D." means a different person on each page; each resolves to the
    full form stated on ITS page — a global resolver cannot do this."""
    mentions = spark.createDataFrame(
        [
            ("u1", "Person", "Alan D."),
            ("u1", "Person", "Alan Dufresne"),
            ("u2", "Person", "Alan D."),
            ("u2", "Person", "Alan Dufresne-Abbott"),
            ("u3", "Person", "Alan D."),  # no expansion on page: untouched
        ],
        "url string, label string, key string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn(
        "attributes", F.map_from_arrays(F.array(), F.array())
    )
    edges = spark.createDataFrame(
        [("u1", "ACTED_IN", "Person", "Alan D.", "Movie", "The X")],
        "url string, label string, src_label string, src_key string, "
        "dst_label string, dst_key string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn(
        "attributes", F.map_from_arrays(F.array(), F.array())
    )
    m, e = page_local_coreference(mentions, edges)
    got = {(r.url, r.key) for r in m.collect()}
    assert ("u1", "Alan Dufresne") in got
    assert ("u2", "Alan Dufresne-Abbott") in got
    assert ("u3", "Alan D.") in got
    assert ("u1", "Alan D.") not in got
    edge = e.first()
    assert edge.src_key == "Alan Dufresne"


def test_incompatible_names_do_not_rewrite(spark):
    mentions = spark.createDataFrame(
        [
            ("u1", "Person", "Alan Dufresne"),
            ("u1", "Person", "Alan Dufresne-Abbott"),  # different person
            ("u1", "Movie", "The Iron Tide"),
            ("u1", "Movie", "The Iron Tide Harvest"),  # different movie
        ],
        "url string, label string, key string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn(
        "attributes", F.map_from_arrays(F.array(), F.array())
    )
    empty_edges = mentions.limit(0).select(
        "url", "warc_ts", F.col("label"),
        F.col("label").alias("src_label"), F.col("key").alias("src_key"),
        F.col("label").alias("dst_label"), F.col("key").alias("dst_key"),
        "attributes",
    )
    m, _ = page_local_coreference(mentions, empty_edges)
    keys = {r.key for r in m.collect()}
    assert keys == {
        "Alan Dufresne", "Alan Dufresne-Abbott",
        "The Iron Tide", "The Iron Tide Harvest",
    }


def test_mid_scale_pipeline_pr(spark, workdir):
    """1200-page corpus (past the 676-person pool, so hyphenated names and
    ambiguous abbreviations occur): P/R must stay >= 0.95. Regression for
    the global-hub false-merge found at 5k pages."""
    from kgforge.plans.pipeline import build_graph
    from kgforge.sources.pages import (
        corpus_to_spark,
        generate_corpus,
        movies_ontology,
    )

    corpus = generate_corpus(n_pages=1200, seed=7)
    pages, gold_triples, _ = corpus_to_spark(spark, corpus)
    out = build_graph(spark, pages, movies_ontology())
    KEY = ["subj_label", "subj_key", "pred", "obj_label", "obj_key"]
    got = {tuple(r) for r in out["triples"].select(*KEY).collect()}
    gold = {tuple(r) for r in gold_triples.select(*KEY).collect()}
    tp = len(got & gold)
    p, r = tp / len(got), tp / len(gold)
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"
