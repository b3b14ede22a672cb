"""Distributed BPE training/encoding vs an independent pure-Python
reference (Sennrich-style greedy merges, same deterministic tie-break:
count DESC, then (left, right) ASC)."""

from __future__ import annotations

from collections import Counter

import pytest

from kgforge.functions.bpe import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    word_freqs,
)


def _ref_word_freqs(texts):
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return c


def _ref_pair_counts(freqs):
    pc: Counter = Counter()
    for syms, f in freqs.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
    return pc


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts, n_merges, min_freq=2):
    wf = _ref_word_freqs(texts)
    state = {tuple(w): f for w, f in wf.items()}
    folded: Counter = Counter()
    for w, f in wf.items():
        folded[tuple(w)] += f
    state = dict(folded)
    merges = []
    for rank in range(1, n_merges + 1):
        pc = _ref_pair_counts(state)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_freq:
            break
        merges.append((rank, left, right, cnt))
        nxt: Counter = Counter()
        for syms, f in state.items():
            nxt[_ref_apply(syms, left, right)] += f
        state = dict(nxt)
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is flat",
    "rats chase the fat cat",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_word_freqs_and_first_pair_counts(spark, docs):
    wf = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert wf == dict(_ref_word_freqs(CORPUS))
    words = word_freqs(docs).selectExpr("freq", "split(word, '') AS syms")
    got = {
        (r.lft, r.rgt): r.cnt for r in bpe_pair_counts(words).collect()
    }
    ref = _ref_pair_counts(
        {tuple(w): f for w, f in _ref_word_freqs(CORPUS).items()}
    )
    assert got == dict(ref)


def test_bpe_train_matches_reference_exactly(spark, docs):
    """The full greedy merge sequence — ranks, pairs, AND counts —
    equals the independent reference, including tie rounds."""
    got = [
        (r.rank, r.lft, r.rgt, r.cnt)
        for r in bpe_train(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == _ref_train(CORPUS, 12)
    # 'at' must be the first merge (cat/sat/mat/bat/chat/that/hat/
    # flat/rats/fat: freq 12 beats 'th' at 6) — guards against
    # off-by-one adjacency
    assert got[0][1:] == ("a", "t", 12)


def test_bpe_train_min_freq_stops_early(spark, docs):
    got = bpe_train(docs, n_merges=500, min_freq=3).collect()
    ref = _ref_train(CORPUS, 500, min_freq=3)
    assert [(r.rank, r.lft, r.rgt, r.cnt) for r in got] == ref
    assert len(got) < 500


def test_bpe_encode_matches_training_segmentation(spark, docs):
    """Encoding with the learned table reproduces the reference's
    final word segmentation, and round-trips the text."""
    merges = bpe_train(docs, n_merges=10)
    out = bpe_encode(docs, merges).orderBy("doc_id").collect()
    # reference final state after the same merges
    ref_merges = _ref_train(CORPUS, 10)
    seg = {}
    for w in _ref_word_freqs(CORPUS):
        syms = tuple(w)
        for _, left, right, _c in ref_merges:
            syms = _ref_apply(syms, left, right)
        seg[w] = list(syms)
    for row in out:
        expect = [
            t for w in row.text.lower().split(" ") if w for t in seg[w]
        ]
        assert row.tokens == expect
        assert "".join(row.tokens) == row.text.lower().replace(" ", "")


def test_bpe_encode_keeps_doc_columns(spark, docs):
    merges = bpe_train(docs, n_merges=3)
    out = bpe_encode(docs, merges)
    assert set(out.columns) == {"doc_id", "text", "tokens"}
    assert out.count() == len(CORPUS)


def test_bpe_pair_counts_plan_shape(spark, docs):
    """Pair counting is the per-round hot loop: it must stay entirely
    JVM-side (no Python eval) with ONE shuffle (partial agg -> exchange
    -> final agg)."""
    words = word_freqs(docs).selectExpr("freq", "split(word, '') AS syms")
    plan = bpe_pair_counts(words)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") >= 1
