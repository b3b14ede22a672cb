

def test_cooccurrence_counts_hand_pairs(spark):
    """Hand corpus: ordered pairs inside the window only; marginals count
    every token occurrence; min_count prunes; window validates."""
    import pytest

    from kgforge.functions.textstats import cooccurrence_counts

    docs = [
        (1, "a b c a b"),
        (2, "a b"),
        (3, "solo"),          # single token: contributes nothing
        (4, None),            # null text: dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccurrence_counts(df, window=2, min_count=1)
    got = {(r.w1, r.w2): (r.cooc, r.cnt1, r.cnt2) for r in out.collect()}
    # doc1 pairs (w=2): ab ac | bc ba | ca cb | ab ; doc2: ab
    assert got[("a", "b")] == (3, 3, 3)
    assert got[("a", "c")] == (1, 3, 1)
    assert got[("b", "c")] == (1, 3, 1)
    assert got[("b", "a")] == (1, 3, 3)
    assert got[("c", "a")] == (1, 1, 3)
    assert got[("c", "b")] == (1, 1, 3)
    assert len(got) == 6  # 'solo' and the null row contribute nothing
    # ordered: (b, a) != (a, b); min_count prunes everything below 3
    pruned = cooccurrence_counts(df, window=2, min_count=3)
    assert {(r.w1, r.w2) for r in pruned.collect()} == {("a", "b")}
    with pytest.raises(ValueError):
        cooccurrence_counts(df, window=0)
