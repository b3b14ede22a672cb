"""kgforge — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of FalkorDB/GraphRAG-SDK-v2 (ontology-guided KG
construction over web text) as an idiomatic Spark DataFrame pipeline:

    pages(url, warc_ts, html, text, lang)
      -> text extraction (bs4-parity, Arrow UDF)          [kgforge.sources.html]
      -> deterministic ontology-driven triple extraction  [kgforge.operators.extract]
      -> normalization + ontology validation              [kgforge.operators.normalize]
      -> entity linking (MinHash-LSH + disambiguation)    [kgforge.operators.link]
      -> connected-components canonicalization            [kgforge.operators.canon]
      -> node/edge materialization (property-graph)       [kgforge.operators.materialize]
    with per-partition lineage + resume                   [kgforge.plans.lineage]

Everything here is built on public knowledge only: the PySpark API and the
reference repo's observable behavior (cited per-module as file:line).
No code is copied from the reference; it is a C-python object pipeline,
this is a declarative Spark DataFrame engine.
"""

__version__ = "0.1.0"

from kgforge.ontology import Attribute, Entity, Ontology, Relation  # noqa: F401
