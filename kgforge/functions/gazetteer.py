"""Gazetteer / dictionary tagging: multi-pattern substring matching
with an Aho-Corasick automaton.

KG construction over web text constantly needs "find every mention of
any of these K known surface forms" — entity gazetteers, blocklists,
product catalogs. The naive Spark shape is a |docs| x |patterns|
contains-join: K passes over the corpus (or an exploded join that
shuffles |docs|·K rows). Aho-Corasick matches ALL patterns in ONE pass
over each document — O(len(text) + matches), independent of K — which
at 100 TB is the difference between one corpus scan and a thousand.

The automaton is a pure-Python goto/fail/output trie built once per
task from the (small, broadcast-by-closure) pattern list; documents
stream through `mapInPandas` in Arrow batches. Per-character Python is
the honest cost of a genuinely sequential algorithm the built-in
expression library cannot express (same seam discipline as the
extraction UDF, operators/extract.py); the plumbing — schema,
batching, single text pass — is the Spark-side contract.

Semantics: counts occurrences at EVERY start position (overlapping
and nested matches all count — "ana" occurs twice in "banana";
"scan" inside "table scan" counts for both patterns), case-sensitive,
raw substring (no word boundaries). The driver gate's DuckDB oracle
replays exactly that definition positionally.

Reference parity: the reference has no batch text-analytics at all;
this extends the §2.8 text-analysis family (functions/textstats.py).
"""

from __future__ import annotations

from collections import Counter, deque
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_automaton(
    patterns: list[str],
) -> tuple[list[dict], list[int], list[tuple]]:
    """Build the Aho-Corasick automaton: (goto, fail, out).

    goto[s] maps char -> next state; fail[s] is the longest proper
    suffix state; out[s] holds the indexes of every pattern ending at s
    — INCLUDING patterns ending at fail-chain ancestors, so nested
    patterns ('scan' inside 'table scan') are reported without walking
    the fail chain at match time.
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    if len(set(patterns)) != len(patterns):
        raise ValueError("duplicate patterns")
    if any(not p for p in patterns):
        raise ValueError("empty pattern")
    goto: list[dict] = [{}]
    out: list[tuple] = [()]
    for idx, p in enumerate(patterns):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append(())
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s] = out[s] + (idx,)
    fail = [0] * len(goto)
    q: deque[int] = deque(goto[0].values())
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0)
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def count_matches(
    automaton: tuple[list[dict], list[int], list[tuple]], text: str
) -> Counter:
    """One pass of `text` through the automaton -> Counter{pattern_idx:
    occurrences}. Every start position counts (overlaps included)."""
    goto, fail, out = automaton
    c: Counter = Counter()
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for i in out[s]:
                c[i] += 1
    return c


def match_counts(
    docs: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id_col, pattern, cnt): per document, how often each
    gazetteer pattern occurs (cnt > 0 rows only).

    One `mapInPandas` pass — the automaton is rebuilt per task from the
    closure-shipped pattern list (build cost is O(total pattern chars),
    trivial next to a single Arrow batch), then every document streams
    through once regardless of how many patterns the gazetteer holds.
    """
    pats = list(patterns)
    id_field = docs.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_field),
            T.StructField("pattern", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    src = docs.select(id_col, text_col).where(F.col(text_col).isNotNull())

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        automaton = build_automaton(pats)
        for pdf in batches:
            ids: list = []
            ps: list[str] = []
            cs: list[int] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for i, n in count_matches(automaton, text).items():
                    ids.append(did)
                    ps.append(pats[i])
                    cs.append(n)
            yield pd.DataFrame({id_col: ids, "pattern": ps, "cnt": cs})

    return src.mapInPandas(gen, schema)
