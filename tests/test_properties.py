"""Property-based tests (hypothesis) — the reference has none (SURVEY §5);
these pin invariants of the pure building blocks without Spark overhead."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.ontology import (
    Attribute,
    sanitize_attr_name,
    sanitize_label,
    sanitize_relation_label,
)
from kgforge.operators.extract import _abbrev_compatible, _clean_key
from kgforge.operators.link import name_match_score, normalize_name

TEXT = st.text(max_size=60)
NAME = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll"), max_codepoint=0x2FF),
    min_size=1,
    max_size=20,
)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_sanitizers_idempotent_and_clean(s):
    for fn in (sanitize_label, sanitize_relation_label, sanitize_attr_name):
        once = fn(s)
        assert fn(once) == once  # idempotent
    assert re.fullmatch(r"[a-zA-Z0-9_]*", sanitize_label(s))
    assert re.fullmatch(r"[A-Z0-9_]*", sanitize_relation_label(s))


@given(
    name=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=1, max_size=15,
    ),
    typ=st.sampled_from(["string", "number", "boolean"]),
    unique=st.booleans(),
    required=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_attribute_codec_roundtrip(name, typ, unique, required):
    """The bare "name:type!*" codec (attribute.py:94-127) round-trips.
    (str(attr) adds prompt-rendering quotes in the reference too and is NOT
    the codec's input form.)"""
    a = Attribute(name, typ, unique, required)
    encoded = f"{a.name}:{a.type}{'!' if a.unique else ''}{'*' if a.required else ''}"
    b = Attribute.from_string(encoded)
    assert (b.name, b.type, b.unique, b.required) == (
        a.name, a.type, a.unique, a.required
    )


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_clean_key_idempotent(s):
    assert _clean_key(_clean_key(s)) == _clean_key(s)


@given(a=NAME, b=NAME)
@settings(max_examples=300, deadline=None)
def test_match_score_symmetric_and_bounded(a, b):
    s1, s2 = name_match_score(a, b), name_match_score(b, a)
    assert 0.0 <= s1 <= 1.0
    assert abs(s1 - s2) < 1e-12  # symmetric
    assert name_match_score(a, a) == 1.0  # reflexive


ASCII_NAME = st.text(
    alphabet=st.characters(min_codepoint=65, max_codepoint=122,
                           whitelist_categories=("Lu", "Ll")),
    min_size=2, max_size=15,
)


@given(first=ASCII_NAME, last=ASCII_NAME)
@settings(max_examples=200, deadline=None)
def test_initial_abbreviation_always_compatible(first, last):
    """'F. Last' is always an abbreviation of 'First Last' for ASCII names.

    (Non-ASCII case-fold edge cases — e.g. Turkish İ lowercasing to two
    codepoints — fall back to the conservative no-merge behavior, which is
    the safe direction for entity linking.)
    """
    full = f"{first} {last}"
    abbrev = f"{first[0]}. {last}"
    assert _abbrev_compatible(abbrev, full)
    # never compatible with a different-surname expansion (no anchor)
    assert not _abbrev_compatible(f"{first[0]}. {last}x", full)


@given(NAME)
@settings(max_examples=200, deadline=None)
def test_normalize_name_idempotent(s):
    assert normalize_name(normalize_name(s)) == normalize_name(s)


@given(st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=100, deadline=None)
def test_chunker_floor_drop_model(rows, k):
    """Python model of the S5 floor-drop: num_docs == len(rows) // k
    (document_loaders/csv.py:20) — mirrors the windowed Spark chunker,
    whose equality with DuckDB is tested in the oracle suite."""
    full_chunks = [rows[i * k:(i + 1) * k] for i in range(len(rows) // k)]
    assert len(full_chunks) == len(rows) // k
    assert all(len(c) == k for c in full_chunks)


def test_stringify_graph_response_shapes(spark):
    """F4 parity (ref helpers.py:52-66): scalars/empty stringify wholesale;
    nested rows stringify per-cell; DataFrames collect then format."""
    from kgforge.functions.codecs import stringify_graph_response as S

    assert S([]) == "[]"
    assert S("done") == "done"
    assert S([1, 2]) == "[1, 2]"
    assert S([[1, "a"], [2, None]]) == "[['1', 'a'], ['2', 'None']]"
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    assert S(df) == "[['1', 'x']]"
