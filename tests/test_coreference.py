"""Document-local coreference: ambiguous abbreviations resolve per document
(inside the extraction UDF — extract._resolve_local_aliases), and the
resolution is similarity-ranked so near-miss longer names never merge."""

from __future__ import annotations

from kgforge.operators.extract import _resolve_local_aliases


def _ents(*pairs):
    return {(label, key): {"name": key} for label, key in pairs}


def test_ambiguous_abbreviation_resolves_per_document():
    """"Alan D." means a different person in each document; each resolves to
    the full form stated in ITS document — a global resolver cannot do
    this, which is why resolution happens inside the per-document UDF."""
    # document 1: the expansion present is "Alan Dufresne"
    e1, r1 = _resolve_local_aliases(
        _ents(("Person", "Alan D."), ("Person", "Alan Dufresne")),
        {("ACTED_IN", "Person", "Alan D.", "Movie", "The X"): {}},
    )
    assert set(e1) == {("Person", "Alan Dufresne")}
    assert set(r1) == {("ACTED_IN", "Person", "Alan Dufresne", "Movie", "The X")}
    # document 2: a different expansion wins in its own document
    e2, _ = _resolve_local_aliases(
        _ents(("Person", "Alan D."), ("Person", "Alan Dufresne-Abbott")), {}
    )
    assert set(e2) == {("Person", "Alan Dufresne-Abbott")}
    # document 3: no expansion present -> untouched
    e3, _ = _resolve_local_aliases(_ents(("Person", "Alan D.")), {})
    assert set(e3) == {("Person", "Alan D.")}


def test_incompatible_names_do_not_rewrite():
    """Distinct real names (no abbreviation relationship) never merge, even
    when one is a prefix of the other."""
    ents = _ents(
        ("Person", "Alan Dufresne"),
        ("Person", "Alan Dufresne-Abbott"),
        ("Movie", "The Iron Tide"),
        ("Movie", "The Iron Tide Harvest"),
    )
    out, _ = _resolve_local_aliases(ents, {})
    assert set(out) == set(ents)


def test_similarity_ranked_expansion():
    """"Rosa X." resolves to "Rosa Xu", not the longer "Rosa Xu-Abbott":
    best expansion is the most SIMILAR compatible longer key, not the
    longest (the hub false-merge regression)."""
    out, _ = _resolve_local_aliases(
        _ents(("Person", "Rosa X."), ("Person", "Rosa Xu"),
              ("Person", "Rosa Xu-Abbott")), {}
    )
    assert set(out) == {("Person", "Rosa Xu"), ("Person", "Rosa Xu-Abbott")}


def test_mid_scale_pipeline_pr(spark, workdir):
    """1200-page corpus (past the 676-person pool, so hyphenated names and
    ambiguous abbreviations occur): P/R must stay >= 0.95. Regression for
    the global-hub false-merge found at 5k pages."""
    from kgforge.plans.pipeline import build_graph
    from kgforge.sources.pages import (
        corpus_to_spark,
        generate_corpus,
        movies_ontology,
    )

    corpus = generate_corpus(n_pages=1200, seed=7)
    pages, gold_triples, _ = corpus_to_spark(spark, corpus)
    out = build_graph(spark, pages, movies_ontology())
    KEY = ["subj_label", "subj_key", "pred", "obj_label", "obj_key"]
    got = {tuple(r) for r in out["triples"].select(*KEY).collect()}
    gold = {tuple(r) for r in gold_triples.select(*KEY).collect()}
    tp = len(got & gold)
    p, r = tp / len(got), tp / len(gold)
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"
