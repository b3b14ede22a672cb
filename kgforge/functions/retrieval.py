"""Lexical retrieval scoring: TF-IDF term statistics + BM25 top-k.

Engine-new surface (the reference SDK retrieves by LLM-generated Cypher
over the KG — `/root/reference/graphrag_sdk/steps/graph_query_step.py` —
with no lexical index): a corpus engine feeding RAG needs a lexical
candidate generator next to the ANN path (`functions/similarity.py`).
The algorithm is public (Robertson et al. BM25; the idf form below is
the Lucene variant ``ln(1 + (N - df + 0.5) / (df + 0.5))``, which is
non-negative for every df).

Scale shape:

- `term_stats` is one explode + two hash aggregates — the inverted-index
  statistics (tf, df, corpus_tf) as plain DataFrames. The heavy shuffle
  keys on (doc, term) then (term); both are fine-grained (a viral term
  is ONE row after the first partial agg, so map-side combine absorbs
  the skew the same way text_repetition's two-level agg does).
- `bm25_topk` never materializes scores for the whole corpus: the tf
  table is filtered to the query's terms BEFORE any join (a scan-side
  isin over at most |query| literals), the per-term idf table is at most
  |query| rows and is broadcast, and the corpus-level constants (N,
  avgdl) ride in as a broadcast 1-row aggregate — so the only data-sized
  operations are the explode and one groupBy over matching (doc, term)
  rows. Top-k is a global TakeOrderedAndProject (k rows to the driver).
- Everything is built-in expressions — no Python on the data plane.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.functions.textstats import tokens_col


def _terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, token occurrence), lowercase whitespace tokens."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")


def term_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Inverted-index statistics as two DataFrames.

    Returns ``(tf, dfreq)``: `tf` has one row per (doc_id, term) with the
    in-document term frequency; `dfreq` has one row per term with its
    document frequency and corpus-wide term frequency. All counts BIGINT
    (cross-engine exact — the driver gate hash-compares them).
    """
    tf = (
        _terms(df, text_col, id_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("corpus_tf"),
    )
    return tf, dfreq


def top_docs_per_term(
    df: DataFrame,
    terms: list[str],
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """For each query term: its df/corpus_tf plus the k highest-tf docs
    (ties broken by doc_id) — the integer-exact core of a lexical index,
    used by the driver gate. The per-term window partitions on the term,
    so no global sort; df/corpus_tf still count over ALL docs."""
    tf, dfreq = term_stats(df, text_col, id_col)
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = (
        tf.filter(F.col("term").isin(terms))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    return (
        ranked.join(dfreq, "term")
        .select("term", "doc_id", "tf", "df", "corpus_tf")
    )


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int | None = None,
) -> DataFrame:
    """Inverted-index export: one row per term (or per term-block) with
    the doc_id-sorted postings array<struct<doc_id, tf>> plus df and
    corpus_tf — the materialized index a retrieval service loads.

    A viral term's postings would otherwise collapse onto one task as a
    single giant array; pass ``block_size`` to shard each term's
    postings into fixed-size blocks (term, block, postings): the block
    number is a per-term row_number over doc_id, so blocks are
    deterministic, ordered, and reassemble by concatenation. df /
    corpus_tf stay per-term totals on every block (they come from the
    pre-blocking aggregate). block_size=None keeps one row per term
    (block 0) — fine when term frequencies are Zipf-capped upstream.
    """
    tf, dfreq = term_stats(df, text_col, id_col)
    if block_size is not None:
        if block_size <= 0:
            raise ValueError("block_size must be positive")
        w = Window.partitionBy("term").orderBy("doc_id")
        tf = tf.withColumn(
            "block",
            F.floor((F.row_number().over(w) - 1) / block_size)
            .cast("long"),
        )
    else:
        tf = tf.withColumn("block", F.lit(0).cast("long"))
    posts = tf.groupBy("term", "block").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("postings")
    )
    return posts.join(dfreq, "term").select(
        "term", "block", "postings", "df", "corpus_tf"
    )


def bm25_topk(
    df: DataFrame,
    query: str | list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by BM25 for a bag-of-words query.

    score(d) = sum over query terms t present in d of
      idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (Lucene BM25).

    Duplicate query terms are counted once (set semantics, like Lucene's
    boolean-OR of unique terms). Returns (doc_id, score) with score
    DESC, doc_id ASC tie-break. Floats: exact cross-engine parity is NOT
    guaranteed (ln is 1-ulp); the pytest pins parity vs a pure-Python
    reference and the driver gate covers the integer statistics.
    """
    terms = sorted(set(query.lower().split() if isinstance(query, str)
                       else [t.lower() for t in query]))
    if not terms:
        raise ValueError("empty query")
    toks = _terms(df, text_col, id_col)
    # per-doc length (ALL terms — BM25 normalizes by full doc length).
    # Computed as an expression over the base table, not from the
    # exploded tokens, so empty docs still count toward N and avgdl
    # (Lucene semantics) and no extra shuffle is paid.
    doclen = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.filter(
                tokens_col(F.lower(F.col(text_col))), lambda x: x != ""
            )
        ).alias("dl"),
    )
    # corpus constants as one broadcastable row
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_reference(
    docs: list[tuple[int, str]],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[int, float]]:
    """Independent pure-Python BM25 (same formula) for the pytest pin."""
    terms = sorted(set(query.lower().split()))
    bags = {i: [t for t in text.lower().split() if t] for i, text in docs}
    n = len(bags)
    avgdl = sum(len(ws) for ws in bags.values()) / n
    dfreq = {
        t: sum(1 for ws in bags.values() if t in ws) for t in terms
    }
    out = []
    for i, ws in bags.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(ws) / avgdl)
            )
        if s > 0.0:
            out.append((i, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase match over positional postings: (doc_id, n_hits,
    first_pos) for every document containing the token sequence
    `phrase` (lowercase whitespace tokenization, same as `term_stats`).
    Positions are 1-based; n_hits counts distinct start positions
    (overlapping hits of a self-repeating phrase each count).

    The positional-index formulation — NOT a substring scan: each token
    occurrence equal to phrase term i votes for anchor (doc, pos − i); an
    anchor collecting all n distinct i's is a hit. Scale shape: the token
    stream is filtered to the phrase's distinct terms BEFORE any shuffle
    (a scan-side isin over |phrase| literals — on a real corpus that
    drops ~all tokens), the per-occurrence term→index expansion is a HOF
    filter over an n-element literal array (no join), and the only
    shuffle keys on fine-grained (doc, anchor). Substring LIKE would scan
    every byte of every document and can't use an inverted index; this
    shape is exactly how Lucene positional queries evaluate, expressed
    as two hash aggregates.

    Reference scope: engine-new (the SDK has no lexical index at all —
    retrieval is LLM-generated Cypher, graph_query_step.py); phrase
    queries complete the term/BM25 surface of `term_stats`/`bm25_topk`.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    n = len(terms)
    phrase_arr = F.array(*[F.lit(t) for t in terms])
    idx_arr = F.array(*[F.lit(i) for i in range(n)])
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col)))).alias(
            "pos0", "term"
        ),
    ).filter(F.col("term").isin(terms))
    votes = tok.select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.explode(
            F.filter(
                idx_arr,
                lambda i: F.element_at(phrase_arr, i + 1) == F.col("term"),
            )
        ).alias("i"),
    )
    hits = (
        votes.groupBy("doc_id", (F.col("pos") - F.col("i")).alias("start"))
        .agg(F.count_distinct("i").alias("k"))
        .filter(F.col("k") == n)
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("start").cast("long").alias("first_pos"),
    )
