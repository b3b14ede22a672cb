#!/usr/bin/env python
"""Cluster entry point: spark-submit --py-files kgforge.zip packaging/submit_job.py

Runs the resumable KG-construction pipeline over a pages table. On a real
cluster the SparkSession comes from spark-submit (master/executors from the
cluster manager); locally it falls back to kgforge.session defaults.

    spark-submit --py-files kgforge.zip packaging/submit_job.py \
        --pages <parquet-or-iceberg-path> --out <output-dir> \
        --ontology <ontology.json> [--run-id <id>] [--lang en]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ontology", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--lang", action="append", default=None)
    ap.add_argument(
        "--wrapper", action="append", default=None,
        help="layout-wrapper name (operators/wrappers.py registry) for "
             "template corpora; repeatable",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kgforge.ontology import Ontology
    from kgforge.plans.pipeline import run_pipeline

    spark = SparkSession.builder.appName("kgforge-pipeline").getOrCreate()
    pages = spark.read.parquet(args.pages)
    onto = Ontology.load(args.ontology)
    out = run_pipeline(
        spark, pages, onto, args.out, run_id=args.run_id,
        lang_filter=args.lang, wrappers=args.wrapper,
    )
    n = out["triples"].count()
    print(f"triples: {n} -> {args.out}/08_triples")


if __name__ == "__main__":
    main()
