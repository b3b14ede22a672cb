"""Distributed BPE tokenizer training over a document corpus.

The missing piece between corpus curation and `sharding.token_shards` /
`pack_sequences`: a training-data pipeline does not just COUNT tokens,
it LEARNS the tokenizer from the corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm; HuggingFace `tokenizers` is the reference behavior for the
greedy merge loop).

Spark shape — the reason BPE distributes cleanly:

- The corpus collapses ONCE into a distinct-WORD frequency table
  (`word_freqs`: explode + groupBy, map-side partial agg). All merge
  learning happens against that table, whose size follows Heaps' law —
  orders of magnitude smaller than the corpus — but is still a
  DataFrame: nothing here assumes it fits anywhere.
- Each merge round needs the best adjacent symbol pair: an
  expression-only adjacency explode (transform over an index sequence,
  built-in functions, WholeStageCodegen) + sum(freq) aggregate +
  a 1-ROW driver action (the argmax). Driver traffic per round is one
  row; the merge list itself is the only driver-side state (n_merges
  rows).
- Applying the winning merge rewrites the symbol arrays of the word
  table (an Arrow-batched pandas UDF — collapsing adjacent pairs is
  inherently sequential per word, but words are short and the table is
  the DISTINCT-word table, not the corpus). A scan-side filter skips
  words that cannot contain the pair. `localCheckpoint` per round
  truncates the UDF-chain lineage.
- Encoding (`bpe_encode`) pays the corpus-sized pass exactly once,
  with the learned merge ranks broadcast as a plain Python dict into
  one mapInPandas — the standard HF apply-merges-by-rank loop,
  vectorized over Arrow batches.

Determinism contract (what the tests pin and a cross-engine oracle can
check): ties in pair counts break by (count DESC, left ASC, right ASC)
— a pure function of the corpus, unlike frequency-dict iteration order
in naive implementations. No end-of-word marker is appended (merges
are over plain characters within words; documented simplification —
add a marker column upstream if suffix-sensitivity is wanted).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_freqs(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus -> (word, freq) distinct-word table (the one corpus-sized
    aggregation of training; everything after runs on its output)."""
    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    w = F.explode(F.split(text, " ")).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _adjacent_pairs(syms_col: str) -> "F.Column":
    """Expression-only (left, right) structs for adjacent symbols.
    Guarded for single-symbol words: Spark's sequence(0, -1) DESCENDS
    ([0, -1]) rather than being empty, so the index list must be
    emptied explicitly."""
    syms = F.col(syms_col)
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(0), F.size(syms) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("lft"),
            F.element_at(syms, i + 2).alias("rgt"),
        ),
    )


def bpe_pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """(lft, rgt, cnt) adjacent-symbol pair counts weighted by word
    freq — one explode + one aggregate, all built-in expressions."""
    return (
        words.filter(F.size(F.col(syms_col)) >= 2)
        .select("freq", F.explode(_adjacent_pairs(syms_col)).alias("p"))
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _merge_batch(left: str, right: str, merged: str):
    def apply(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if (
                        i + 1 < n
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return apply


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus: (rank, lft, rgt,
    cnt), rank 1-based in learning order. Stops early when the best
    remaining pair's count drops below `min_freq`."""
    spark = docs.sparkSession
    words = (
        word_freqs(docs, text_col=text_col, lowercase=lowercase)
        .select("freq", F.split("word", "").alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            bpe_pair_counts(words)
            .orderBy(F.col("cnt").desc(), "lft", "rgt")
            .first()
        )
        if best is None or best.cnt < min_freq:
            break
        merges.append((rank, best.lft, best.rgt, best.cnt))
        merged = best.lft + best.rgt
        # scan-side skip: a word shorter than the merged token cannot
        # contain the pair; the UDF then re-checks adjacency exactly
        can_hit = F.exists(
            _adjacent_pairs("syms"),
            lambda p: (p["lft"] == best.lft) & (p["rgt"] == best.rgt),
        )
        hit = words.filter(can_hit)
        miss = words.filter(~can_hit)
        rewritten = hit.mapInPandas(
            _merge_batch(best.lft, best.rgt, merged),
            "freq long, syms array<string>",
        )
        words = miss.unionByName(rewritten).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lft string, rgt string, cnt long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: adds `out_col`
    (array<string>). The merge list is collected (n_merges rows —
    tokenizer-sized, not data-sized) and broadcast into ONE
    mapInPandas over the corpus; per word, merges REPLAY in rank order
    — exactly the sequence training applied, so encoding a training
    word reproduces its final training segmentation by construction
    (pinned in test_bpe). Distinct words are memoized per batch."""
    ranked = [
        (r.lft, r.rgt)
        for r in merges.orderBy("rank").collect()
    ]
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    prepared = docs.withColumn("__words", F.split(text, " "))
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in prepared.schema.fields
        if f.name != "__words"
    )

    def encode(batches):
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            for lft, rgt in ranked:
                if len(syms) < 2:
                    break
                res, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == lft
                        and syms[i + 1] == rgt
                    ):
                        res.append(lft + rgt)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            cache[w] = syms
            return syms

        for pdf in batches:
            toks = [
                [t for w in ws if w for t in enc_word(w)]
                for ws in pdf["__words"]
            ]
            pdf = pdf.drop(columns=["__words"])
            pdf[out_col] = toks
            yield pdf

    return prepared.mapInPandas(
        encode, f"{out_fields}, {out_col} array<string>"
    )
