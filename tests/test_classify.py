"""Naive Bayes classifier: training statistics + prediction parity with
a pure-Python reference (same smoothing, same tie rule)."""

import math

import pytest


def _py_nb(train, test, alpha=1.0):
    """Reference multinomial NB. train: list[(cls, text)]."""
    from collections import Counter, defaultdict

    cnt: dict[str, Counter] = defaultdict(Counter)
    nd: Counter = Counter()
    nt: Counter = Counter()
    vocab = set()
    for cls, text in train:
        toks = text.lower().split()
        cnt[cls].update(toks)
        nd[cls] += 1
        nt[cls] += len(toks)
        vocab.update(toks)
    classes = sorted(nd)
    n_total = sum(nd.values())
    v = len(vocab)
    out = []
    for text in test:
        toks = text.lower().split()
        scores = {}
        for c in classes:
            s = math.log(nd[c] / n_total)
            s -= len(toks) * math.log(nt[c] + alpha * v)
            for w in toks:
                s += math.log(cnt[c][w] + alpha)
            scores[c] = s
        best = max(scores.values())
        pred = next(c for c in classes if scores[c] == best)
        out.append((pred, scores))
    return out


TRAIN = [
    ("spam", "buy cheap pills now"),
    ("spam", "cheap pills cheap deals now"),
    ("spam", "win cash now"),
    ("ham", "meeting notes attached for review"),
    ("ham", "please review the quarterly notes"),
    ("ham", "lunch meeting moved to noon"),
]
TEST = [
    "cheap pills",
    "review the notes",
    "now",
    "completely unseen tokens here",  # all-OOV: priors + normalizer only
]


def test_nb_predictions_match_python_reference(spark):
    from kgforge.functions.classify import nb_predict, nb_train

    df = spark.createDataFrame(TRAIN, "cls string, text string")
    model = nb_train(df, "cls")
    assert model.classes == ["ham", "spam"]
    assert model.n_docs == {"ham": 3, "spam": 3}
    assert model.n_tokens == {"ham": 15, "spam": 12}
    assert model.vocab_size == 19

    test_df = spark.createDataFrame(
        list(enumerate(TEST)), "doc_id long, text string"
    )
    got = {
        r.id: (r.pred, r.logp_ham, r.logp_spam)
        for r in nb_predict(test_df, model).collect()
    }
    ref = _py_nb(TRAIN, TEST)
    for i, (pred, scores) in enumerate(ref):
        assert got[i][0] == pred, (i, got[i], scores)
        assert got[i][1] == pytest.approx(scores["ham"], rel=1e-12)
        assert got[i][2] == pytest.approx(scores["spam"], rel=1e-12)


def test_nb_empty_model_raises(spark):
    from kgforge.functions.classify import NBModel, nb_predict

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    empty = NBModel(
        token_df=df.limit(0).select(df.text.alias("w")),
        classes=[],
        n_docs={},
        n_tokens={},
        vocab_size=0,
    )
    with pytest.raises(ValueError):
        nb_predict(df, empty)
