"""Aho-Corasick gazetteer matching (functions/gazetteer.py).

The driver gate (text_gazetteer) hash-compares counts against a DuckDB
positional-substring oracle on the documents table; these tests pin the
automaton semantics the gate can't isolate: overlap counting, nested
patterns via fail-link outputs, case sensitivity, executor-side typing.
"""

import hashlib

import pytest

from kgforge.functions.gazetteer import (
    build_automaton,
    count_matches,
    match_counts,
)


def _brute(patterns, text):
    # every start position, per pattern
    return {
        i: sum(
            1
            for j in range(len(text) - len(p) + 1)
            if text[j : j + len(p)] == p
        )
        for i, p in enumerate(patterns)
    }


def _counts(patterns, text):
    got = dict(count_matches(build_automaton(patterns), text))
    want = {i: n for i, n in _brute(patterns, text).items() if n}
    return got, want


def test_overlapping_self_pattern():
    got, want = _counts(["ana", "banana"], "bananana")
    assert got == want == {0: 3, 1: 1}


def test_nested_patterns_fail_link_outputs():
    # 'scan' ends inside every 'table scan' match: both must count
    got, want = _counts(
        ["scan", "table scan", "able"], "a table scan then a scan"
    )
    assert got == want == {0: 2, 1: 1, 2: 1}


def test_shared_prefix_and_case_sensitivity():
    got, want = _counts(["ab", "abc", "abd", "Ab"], "ab abc abd aB Ab")
    assert got == want
    assert got[0] == 3 and got[3] == 1


def test_randomized_vs_bruteforce():
    # deterministic pseudo-random text over a 3-letter alphabet: dense
    # overlaps exercise the fail chain hard
    text = "".join(
        "abc"[int(hashlib.md5(f"gz|{i}".encode()).hexdigest()[:2], 16) % 3]
        for i in range(500)
    )
    pats = ["a", "ab", "ba", "abc", "cab", "bca", "aa", "abcabc"]
    got, want = _counts(pats, text)
    assert got == want


def test_build_validation():
    with pytest.raises(ValueError):
        build_automaton([])
    with pytest.raises(ValueError):
        build_automaton(["a", "a"])
    with pytest.raises(ValueError):
        build_automaton(["a", ""])


def test_match_counts_spark(spark):
    docs = spark.createDataFrame(
        [
            (1, "the table scan ran a scan"),
            (2, "no hits here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = match_counts(docs, ["scan", "table scan"]).collect()
    got = {(r.doc_id, r.pattern): r.cnt for r in out}
    assert got == {(1, "scan"): 2, (1, "table scan"): 1}
    # executor-side types survive Arrow
    assert all(isinstance(r.cnt, int) for r in out)
