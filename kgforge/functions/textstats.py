"""Text-analysis operators for large-scale corpus curation.

All hot-path expressions are JVM-side built-ins (`pyspark.sql.functions`) so
they stay inside WholeStageCodegen — no Python on the per-row path. Each
function has a DuckDB-expressible twin in `kgforge/driver_queries.py` so the
driver's oracle gate covers it.

Semantics are engine-defined (the reference has no corpus-curation surface);
they extend the KG pipeline with the curation steps a 100 TB Common-Crawl
corpus needs before extraction: token counting, quality scoring, language ID,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small, fixed English function-word list for the n-gram-free language
# heuristic. Deterministic and tiny by design: at 100 TB the language gate
# must be a pure column expression, not a model call.
EN_STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "was",
    "for", "with", "as", "by", "at", "it", "this", "that", "from",
]

_WS = r"\s+"
_PUNCT = r"[.!?,;:]"
_WORD = r"[A-Za-z0-9_]+"
# BPE-ish pre-tokenizer: words OR single non-space-non-word symbols — the
# standard GPT-2-style pre-split shape, expressible in one regex count.
_BPE_ISH = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text -> [''])."""
    return F.split(F.trim(text), _WS)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens (whitespace), n_words (\\w+ runs), n_bpe (BPE-ish regex)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(tokens_col(t)),
            "n_words": F.regexp_count(t, F.lit(_WORD)),
            "n_bpe": F.regexp_count(t, F.lit(_BPE_ISH)),
        }
    )


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality signals: lengths, punctuation, casing, stopword hits.

    Integer-valued on purpose: downstream threshold filters then compare
    ints (engine-vs-oracle bit-exact); ratios are derived by the caller.
    """
    t = F.col(text_col)
    toks = tokens_col(F.lower(t))
    return df.withColumns(
        {
            "n_chars_m": F.length(t),
            "n_tokens": F.size(tokens_col(t)),
            "n_punct": F.regexp_count(t, F.lit(_PUNCT)),
            "n_upper": F.regexp_count(t, F.lit("[A-Z]")),
            "n_stop_distinct": F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS]))
            ),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", min_hits: int = 2) -> DataFrame:
    """Heuristic language gate: >= min_hits distinct English function words.

    Adds pred_lang ('en' | 'other'). Integer threshold keeps it bit-exact
    against the SQL oracle (no float ratio compare).
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS]))
    )
    return df.withColumn(
        "pred_lang", F.when(hits >= min_hits, F.lit("en")).otherwise(F.lit("other"))
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A.1.1 quality
    filters): per-document line-duplication and top-bigram dominance.

    Adds integer columns (ratios are the caller's threshold compare,
    kept as integer cross-multiplications for engine-exactness):

    - ``n_lines`` / ``n_distinct_lines`` — duplicate-line fraction is
      ``1 - distinct/lines``; boilerplate-heavy pages repeat lines.
    - ``n_bigrams`` / ``top_bigram_n`` — occurrences of the most
      frequent token 2-gram; templated/spammy text is dominated by one
      bigram ("click here click here ...").

    Line stats are pure column expressions (WholeStageCodegen). The
    top-bigram mode needs a per-(doc, bigram) count: explode -> two-level
    hash aggregate keyed (id, bigram) then (id) — partial aggregation
    collapses repeats map-side, and the shuffle key includes the bigram,
    so one viral bigram cannot hot-spot a reducer at 100 TB. The token
    array is materialized ONCE into a real column before the bigram
    transform (higher-order-function subexpressions are not CSE'd).
    Docs with < 2 tokens get top_bigram_n = n_bigrams = 0; NULL text
    stays NULL on the line stats and 0 on the bigram stats.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    base = df.withColumns(
        {
            "n_lines": F.size(lines).cast("long"),
            "n_distinct_lines": F.size(F.array_distinct(lines)).cast("long"),
            "__toks": tokens_col(t),
        }
    )
    base = base.withColumn(
        "__bigrams",
        F.when(
            F.size("__toks") >= 2,
            F.expr(
                "transform(sequence(0, size(__toks)-2),"
                " i -> concat(__toks[i], ' ', __toks[i+1]))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    counts = (
        base.select(id_col, F.explode("__bigrams").alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            F.max("__c").alias("top_bigram_n"),
            F.sum("__c").alias("n_bigrams"),
        )
    )
    return (
        base.drop("__toks", "__bigrams")
        .join(counts, on=id_col, how="left")
        .fillna({"top_bigram_n": 0, "n_bigrams": 0})
    )


def zipf_rank_model(
    ref: DataFrame, text_col: str = "text", top_n: int = 50_000
) -> DataFrame:
    """Fit a Zipf-rank unigram model on a reference corpus slice.

    CCNet-style LM quality filtering (Wenzek et al. 2020) without
    floating-point log-probabilities: rank the reference slice's tokens by
    frequency (ties broken by token string, so the model is a pure function
    of the data). Under Zipf's law ``log p(tok) ~ -log rank``, so a
    document's mean token rank is a monotone proxy for its unigram
    perplexity — and it is INTEGER-valued, which keeps the engine-vs-oracle
    comparison bit-exact (this repo's standing rule: no float-sum compares).

    Scale shape: token counts are a groupBy (map-side partial agg collapses
    the Zipf head before the shuffle); the top-``top_n`` cut compiles to
    TakeOrderedAndProject (no full sort); the row_number window then runs
    over at most ``top_n`` rows, so its single-partition plan is bounded by
    construction and the returned model is always broadcast-sized.

    Returns (tok, rank) with rank 1 = most frequent.
    """
    toks = ref.where(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS)).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("tok").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("__c").desc(), F.col("tok").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "tok", "rank"
    )


def zipf_quality(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a `zipf_rank_model`: summed token rank.

    Adds per-document BIGINT columns (ratios/means are the caller's
    threshold compare, per the integer-exactness rule):

    - ``n_tok`` — token count;
    - ``n_oov`` — tokens outside the model vocabulary;
    - ``sum_rank`` — sum of each token's model rank, OOV tokens charged
      ``max(rank) + 1``. ``sum_rank / n_tok`` (caller-side) is the
      mean-rank quality score: low = fluent head-heavy text, high =
      rare-token soup (the unigram-perplexity proxy used to gate
      web-crawl text before training).

    Documents with NULL text keep zeros. Scale shape: explode preserves
    the source partitioning; the model join is an explicit broadcast (the
    model is vocab-sized by construction); the OOV rank rides as a 1-row
    broadcast cross join; the per-doc re-aggregate collapses to one row
    per document map-side before its shuffle. The model is materialized
    ONCE (eager localCheckpoint — vocab-sized, cheap): it feeds both the
    token join and the OOV-rank aggregate, and without the checkpoint
    each consumer would re-run the fit — a double scan of the reference
    slice at scale.
    """
    model = model.localCheckpoint()
    oov = model.agg((F.max("rank") + F.lit(1)).alias("__oov"))
    toks = df.where(F.col(text_col).isNotNull()).select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS)).alias("tok"),
    )
    per_doc = (
        toks.join(F.broadcast(model), on="tok", how="left")
        .join(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum(F.when(F.col("rank").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("rank"), F.col("__oov")))
            .cast("long")
            .alias("sum_rank"),
        )
    )
    return df.join(per_doc, on=id_col, how="left").fillna(
        {"n_tok": 0, "n_oov": 0, "sum_rank": 0}
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form for fingerprints: lower + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), _WS, " "))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add fp = md5 of the normalized text (exact-dup identity at scale).

    md5 over utf-8 bytes — stable across engines (DuckDB md5() matches),
    unlike xxhash64 whose seed is Spark-specific.
    """
    return df.withColumn(
        "fp", F.md5(F.encode(normalize_text(F.col(text_col)), "UTF-8"))
    )


def cooccurrence_counts(
    df: DataFrame,
    window: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Windowed token co-occurrence counts: (w1, w2, cooc, cnt1, cnt2).

    The word2vec/GloVe/PMI precursor table: every ORDERED pair
    (token at i, token at j) with i < j <= i + window, counted over the
    corpus, joined with each side's marginal occurrence count. All
    integers — PMI itself is ``log(cooc * total / (cnt1 * cnt2))``,
    derived by the caller (floats stay out of the exact artifact).

    Scale shape: pair GENERATION is one pass of higher-order-function
    expressions over a projected token array (no self-join of the
    exploded token table — that join re-shuffles the full corpus twice
    and explodes skew on viral tokens); counting is a map-side-combined
    groupBy. ``min_count`` prunes the hapax tail BEFORE the marginal
    joins, so the join input is the (small) frequent-pair table, not
    every distinct pair. Marginal joins are plain equi-joins AQE can
    broadcast when the vocabulary fits.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    d = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(doc_col),
            F.split(F.trim(F.lower(F.col(text_col))), _WS).alias("__t"),
        )
        .where(F.size("__t") >= 2)
    )
    t = F.col("__t")
    # i runs over 1-based positions 1..n-1; partners are slice(i+1, window)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(t, i + 1, window),
                lambda w2: F.struct(
                    F.element_at(t, i).alias("w1"), w2.alias("w2")
                ),
            ),
        )
    )
    cooc = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cooc"))
        .where(F.col("cooc") >= min_count)
    )
    marg = (
        d.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        cooc.join(marg.withColumnRenamed("w", "w1"), "w1")
        .withColumnRenamed("cnt", "cnt1")
        .join(
            marg.withColumnRenamed("w", "w2").withColumnRenamed("cnt", "cnt2"),
            "w2",
        )
        .select("w1", "w2", "cooc", "cnt1", "cnt2")
    )


def textrank_keywords(
    df: DataFrame,
    window: int = 5,
    min_cooc: int = 2,
    n_iter: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau 2004): -> (w, rank).

    PageRank over the corpus co-occurrence graph — tokens are nodes,
    an (undirected) edge connects tokens co-occurring within
    ``window``, and the stationary score ranks keywords. Composes two
    existing scale primitives: `cooccurrence_counts` (expression-only
    pair generation, hapax-pruned) builds the edge list, and
    `plans/graph_query.pagerank(scaled=True)` runs the BIGINT
    fixed-point recurrence (exact across engines and partial-agg
    orders). Unweighted-edge variant (the original paper's keyword
    setup); ``min_cooc`` is the graph's noise floor.
    """
    from kgforge.plans.graph_query import pagerank

    cooc = cooccurrence_counts(
        df, window=window, min_count=min_cooc,
        text_col=text_col, doc_col=doc_col,
    ).select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
    edges = cooc.unionByName(
        cooc.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    out = pagerank(edges, n_iter=n_iter, scaled=True, dedup=False)
    return out.select(F.col("id").alias("w"), F.col("rank"))


def rake_word_scores(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_freq: int = 1,
) -> DataFrame:
    """RAKE word statistics (Rose et al. 2010): candidate phrases are
    maximal runs of content tokens between delimiters (stopwords or
    non-alphabetic tokens), and each word accumulates

        freq  = occurrences inside candidate phrases
        deg   = Σ over those occurrences of the containing phrase's
                length (the word's co-occurrence degree, self included)

    — both exact BIGINTs; RAKE's word score deg/freq and phrase scores
    (Σ deg/freq over a phrase's words) are read-time float expressions,
    kept out of the hash compare (the standing float rule).

    Shape: tokenization + delimiter flags are pure expressions; phrase
    ids are ONE running-sum window over (doc, position) — the
    gaps-and-islands trick from merge_intervals, no self-join; phrase
    lengths ride a second window on the SAME (doc-keyed) sort; the
    final word aggregate is map-side combining. RE2-portable alpha
    test, so the DuckDB oracle replays the identical rule.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), _WS)
    d = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(doc_col).alias("__doc"), toks.alias("__t"))
        .where(F.size("__t") >= 1)
        .select(
            "__doc", F.posexplode("__t").alias("__pos", "__w")
        )
    )
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    is_delim = (~F.col("__w").rlike("^[a-z]+$")) | F.array_contains(
        stop, F.col("__w")
    )
    d = d.withColumn("__delim", is_delim.cast("long"))
    w_run = (
        Window.partitionBy("__doc")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__phrase", F.sum("__delim").over(w_run)).where(
        F.col("__delim") == 0
    )
    w_len = Window.partitionBy("__doc", "__phrase")
    d = d.withColumn("__plen", F.count("*").over(w_len))
    out = d.groupBy(F.col("__w").alias("word")).agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("__plen").cast("long").alias("deg"),
    )
    return out.where(F.col("freq") >= int(min_freq))


def kn_bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Kneser-Ney bigram sufficient statistics — the count tables an
    interpolated-KN language model needs, all exact BIGINTs (the LM
    itself, `kn_prob`, is read-time float arithmetic over these):

        c            bigram count c(w1 w2)
        c_left       context total c(w1 ·) = Σ_w c(w1 w)
        n_right      N1+(w1 ·)  distinct continuations of w1
        n_left       N1+(· w2)  distinct contexts of w2  (the KN
                     continuation count — "how many ways has w2 been
                     a novel continuation")
        n_bigrams    total distinct bigram types

    Shape: adjacent-pair generation is one pass of HOF expressions
    over the projected token array (the cooccurrence_counts rule — no
    exploded self-join); the marginals derive from the (small) bigram
    count table, never from a second corpus scan; `min_count` prunes
    output rows AFTER marginals so the statistics stay unbiased.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), _WS)
    d = (
        df.where(F.col(text_col).isNotNull())
        .select(toks.alias("__t"))
        .where(F.size("__t") >= 2)
    )
    t = F.col("__t")
    # GOTCHA: sequence(1, 0) DESCENDS in Spark — the size guard above
    # keeps the range non-empty
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"),
            F.element_at(t, i + 1).alias("w2"),
        ),
    )
    counts = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    from kgforge.cache import persist_tracked

    counts = persist_tracked(counts)
    left = counts.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c_left"),
        F.count("*").cast("long").alias("n_right"),
    )
    right = counts.groupBy("w2").agg(
        F.count("*").cast("long").alias("n_left")
    )
    total = counts.agg(F.count("*").cast("long").alias("n_bigrams"))
    out = (
        counts.join(left, on="w1")
        .join(right, on="w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "c", "c_left", "n_right", "n_left", "n_bigrams"
        )
    )
    return out.where(F.col("c") >= int(min_count))


def kn_prob(counts: DataFrame, discount: float = 0.75) -> DataFrame:
    """Read-time interpolated Kneser-Ney probability per bigram row:
    P(w2|w1) = max(c−d,0)/c_left + d·n_right/c_left · n_left/n_bigrams.
    Floats appear HERE, after all counting (pytest pins that the
    distribution sums to 1 over each context's continuations plus the
    unseen mass)."""
    d = float(discount)
    disc = F.greatest(F.col("c") - F.lit(d), F.lit(0.0)) / F.col("c_left")
    lam = F.lit(d) * F.col("n_right") / F.col("c_left")
    cont = F.col("n_left") / F.col("n_bigrams")
    return counts.select(
        "*", (disc + lam * cont).alias("p_kn")
    )
