"""Bucket-size caps in corpus dedup: a boilerplate-heavy corpus must not
explode a single LSH band / SimHash chunk bucket into O(bucket^2) candidate
pairs (the crawl-scale skew cell AQE cannot split). Mirrors the guard that
entity linking already had (link._pairs_on)."""

from __future__ import annotations

import random

from kgforge.functions import dedup as D


def _corpus(spark, n_tokens: int = 40):
    """500 docs: 100 identical boilerplate copies (20%), 390 unique,
    10 planted near-dup pairs among the unique docs."""
    rng = random.Random(99)
    words = [f"w{i}" for i in range(5000)]
    rows = []
    boiler = " ".join(rng.choice(words) for _ in range(n_tokens))
    for i in range(100):
        rows.append((i, boiler))
    uniq_texts = []
    for i in range(100, 490):
        t = " ".join(rng.choice(words) for _ in range(n_tokens))
        uniq_texts.append((i, t))
        rows.append((i, t))
    planted = []
    for j in range(10):
        base_id, base_text = uniq_texts[j * 7]
        toks = base_text.split()
        toks[17] = "zq"  # one-word mutation -> jaccard ~ 39/41
        rows.append((1000 + j, " ".join(toks)))
        planted.append((base_id, 1000 + j))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return df, planted, set(range(100))


def test_minhash_cap_bounds_boilerplate(spark):
    df, planted, boiler_ids = _corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_pairs(df, max_bucket=50).collect()
    }
    # every planted near-dup pair survives the cap (recall intact)
    for a, b in planted:
        assert (a, b) in pairs, (a, b)
    # the 100-doc boilerplate clique (4950 pairs) is excluded, keeping the
    # candidate volume bounded by the discriminative buckets
    assert not any(a in boiler_ids and b in boiler_ids for a, b in pairs)
    assert len(pairs) < 100


def test_minhash_uncapped_returns_clique(spark):
    """Contrast: max_bucket=None preserves the old exhaustive behavior."""
    df, _, boiler_ids = _corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_pairs(df, max_bucket=None).collect()
    }
    clique = {(a, b) for a, b in pairs if a in boiler_ids and b in boiler_ids}
    assert len(clique) == 100 * 99 // 2


def test_simhash_cap_bounds_boilerplate(spark):
    # longer docs: a one-word mutation of a 200-token doc stays within
    # Hamming<=3 with high probability (SimHash targets near-identity)
    df, planted, boiler_ids = _corpus(spark, n_tokens=200)
    pairs = {
        (r.id_a, r.id_b)
        for r in D.simhash_pairs(df, max_bucket=50).collect()
    }
    assert not any(a in boiler_ids and b in boiler_ids for a, b in pairs)
    found = sum(1 for p in planted if p in pairs)
    assert found >= 8, found
    assert len(pairs) < 200
    D.release_cached()


# ------------------------------------------------ paragraph dedup (exact)


def test_paragraph_dedup_keep_first_and_reassemble(spark):
    """Cross-doc dup kept at first (doc, pos); within-doc repeat kept
    once; all-repeat docs disappear; empty paragraphs drop; surviving
    paragraphs reassemble in original order."""
    df = spark.createDataFrame(
        [
            (1, "alpha\n\nbeta\n\nalpha"),       # within-doc repeat
            (2, "beta\n\ngamma"),                 # beta already seen
            (3, "alpha\n\nbeta"),                 # fully duplicate doc
            (4, "\n\ndelta\n\n\n\ngamma"),        # empties + late gamma
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_kept"], r["text"])
        for r in D.dedup_paragraphs(df).collect()
    }
    assert out == {
        1: (2, "alpha\n\nbeta"),
        2: (1, "gamma"),
        4: (1, "delta"),
    }


def test_paragraph_dedup_single_paragraph_docs_degenerate_to_exact(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in D.dedup_paragraphs(df).collect()}
    assert out == {1: "same", 3: "other"}


def test_dedup_against_snapshot_and_batch(spark):
    """Cross-snapshot drops rows whose normalized text is already seen;
    within-batch keeps the min-id row; normalization folds case and
    whitespace; all original columns survive."""
    from kgforge.functions.dedup import dedup_against

    seen = spark.createDataFrame(
        [(1, "Hello  World"), (2, "old news")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "hello world"),    # dup of seen #1 (normalized)
            (11, "fresh thing"),
            (12, "FRESH  thing "),  # in-batch dup of 11
            (13, "another"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_against(new, seen).collect()}
    assert set(out) == {11, 13}
    assert out[11] == "fresh thing"  # original text preserved
    # idempotence: survivors re-run against seen+survivors -> unchanged
    surv = dedup_against(new, seen)
    again = {r.doc_id for r in dedup_against(surv, seen).collect()}
    assert again == {11, 13}


def test_minhash_index_against_snapshot(spark, tmp_path):
    """Incremental near-dup: band the snapshot ONCE (MinHashIndex), then
    join each new batch against it — near-dups of snapshot docs are
    found, fresh docs are not, and a saved/loaded index answers
    identically."""
    from kgforge.functions.dedup import (
        MinHashIndex, minhash_against, minhash_index,
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions beneath the ancient stone bridge at midnight "
        "and the river carries every secret to the patient sea"
    )
    snapshot = spark.createDataFrame(
        [(i, f"{base_text} variant {i}") for i in range(20)]
        + [(100, "completely different text about spark shuffles and "
                 "partition pruning in columnar storage engines today")],
        "doc_id long, text string",
    )
    idx = minhash_index(snapshot)
    # near-dup of snapshot doc (drop the last 3 words), one fresh doc
    near = base_text.rsplit(" ", 3)[0] + " variant 3"
    new = spark.createDataFrame(
        [(1000, near),
         (2000, "unrelated fresh content on gardening tulip bulbs and "
                "compost rotation schedules for northern climates soon")],
        "doc_id long, text string",
    )
    hits = minhash_against(new, idx).collect()
    assert {r.new_id for r in hits} == {1000}
    assert all(
        10 * r.inter >= 7 * r.uni and r.seen_id < 100 for r in hits
    )
    # save/load answers identically (params ride with the index)
    path = str(tmp_path / "mh_idx")
    idx.save(path)
    idx2 = MinHashIndex.load(spark, path)
    assert idx2.params == idx.params
    hits2 = {
        (r.new_id, r.seen_id) for r in minhash_against(new, idx2).collect()
    }
    assert hits2 == {(r.new_id, r.seen_id) for r in hits}


def test_dedup_against_null_text_survives(spark):
    """Review fix: NULL-text rows fingerprint as empty (they previously
    vanished through the non-null-safe joins — neither kept nor
    deduped)."""
    from kgforge.functions.dedup import dedup_against

    seen = spark.createDataFrame([(1, "seen")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, None), (11, ""), (12, "fresh")], "doc_id long, text string"
    )
    out = {r.doc_id for r in dedup_against(new, seen).collect()}
    # NULL and "" share the empty fingerprint -> keep-first keeps 10
    assert out == {10, 12}
