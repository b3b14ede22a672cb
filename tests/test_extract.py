"""M2: deterministic extraction — unit rules + corpus-level P/R gate."""

from kgforge.operators.extract import _CompiledRules, compile_rules
from kgforge.sources.pages import generate_corpus, movies_ontology


def _cr():
    return _CompiledRules(compile_rules(movies_ontology()))


def _triples(rels):
    return {
        (r["src_label"], r["src_key"], r["label"], r["dst_label"], r["dst_key"])
        for r in rels
    }


def test_active_voice():
    _, rels = _cr().extract_document("Alan Abbott directed The Dark Tide.")
    assert _triples(rels) == {
        ("Person", "Alan Abbott", "DIRECTED", "Movie", "The Dark Tide")
    }


def test_passive_voice():
    _, rels = _cr().extract_document("The Dark Tide was directed by Alan Abbott.")
    assert _triples(rels) == {
        ("Person", "Alan Abbott", "DIRECTED", "Movie", "The Dark Tide")
    }


def test_attributed_relation():
    _, rels = _cr().extract_document(
        "Grace Okafor acted in The Lost Harbor as Vera the Cipher."
    )
    assert rels[0]["attributes"] == {"role": "Vera the Cipher"}


def test_typing_sentence():
    ents, rels = _cr().extract_document("Dana Castillo is a Person.")
    assert rels == []
    assert ents == [
        {
            "label": "Person",
            "key": "Dana Castillo",
            "attributes": {"name": "Dana Castillo"},
        }
    ]


def test_attribute_sentence_assigns_label_and_value():
    ents, _ = _cr().extract_document("The release year of The Dark Tide is 1984.")
    assert ents == [
        {
            "label": "Movie",
            "key": "The Dark Tide",
            "attributes": {"title": "The Dark Tide", "release_year": "1984"},
        }
    ]


def test_noise_precision():
    ents, rels = _cr().extract_document(
        "Festival premiere studio weekend. Critics Audiences Weekend anthem."
    )
    assert rels == []
    assert ents == []


def test_initials_not_split():
    _, rels = _cr().extract_document("J. Dufresne directed The Pale Quarry.")
    assert ("Person", "J. Dufresne", "DIRECTED", "Movie", "The Pale Quarry") in _triples(
        rels
    )


def test_input_cap_is_characters():
    # P2: content[:max_input_tokens] slices characters (extract_data_step.py:119)
    text = ("x" * 100) + " Alan Abbott directed The Dark Tide."
    _, rels = _CompiledRules(compile_rules(movies_ontology())).extract_document(
        text[:100]
    )
    assert rels == []


def test_corpus_pr_gate():
    """Extraction-only P/R >= 0.95 vs gold with oracle alias resolution.

    (The pipeline e2e test asserts the same gate with the engine's OWN
    linking instead of the oracle map.)
    """
    c = generate_corpus(n_pages=120, seed=42)
    cr = _cr()
    alias_map = {a["mention"]: a["canonical"] for a in c.aliases}
    pred = set()
    for p in c.pages:
        _, rels = cr.extract_document(p["text"])
        for r in rels:
            pred.add(
                (
                    r["src_label"],
                    alias_map.get(r["src_key"], r["src_key"]),
                    r["label"],
                    r["dst_label"],
                    alias_map.get(r["dst_key"], r["dst_key"]),
                )
            )
    gold = {
        (t["subj_label"], t["subj_key"], t["pred"], t["obj_label"], t["obj_key"])
        for t in c.triples
    }
    tp = len(pred & gold)
    precision = tp / max(1, len(pred))
    recall = tp / len(gold)
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_extract_ir_spark_matches_local(spark):
    """mapInPandas output == driver-side extraction for every page."""
    from kgforge.operators.extract import extract_ir
    from kgforge.sources.pages import corpus_to_spark

    c = generate_corpus(n_pages=12, seed=9)
    pages, _, _ = corpus_to_spark(spark, c)
    rules = compile_rules(movies_ontology())
    got = {
        (r["url"], str(r["warc_ts"])): (r["entities"], r["relations"])
        for r in extract_ir(pages, rules).collect()
    }
    cr = _CompiledRules(rules)
    for p in c.pages:
        ents, rels = cr.extract_document(p["text"])
        g_ents, g_rels = got[(p["url"], str(p["warc_ts"].replace(tzinfo=None)))]
        assert len(g_ents) == len(ents)
        assert len(g_rels) == len(rels)
        assert {(e["label"], e["key"]) for e in ents} == {
            (e["label"], e["key"]) for e in g_ents
        }


def test_comma_list_objects():
    """"X acted in A, B, and C." emits one relation per listed object;
    comma-free 'A and B' stays a single mention (unchanged ambiguity)."""
    _, rels = _cr().extract_document(
        "Rosa Xu acted in The Dark Tide, Iron Harvest, and Silent Run."
    )
    assert _triples(rels) == {
        ("Person", "Rosa Xu", "ACTED_IN", "Movie", "The Dark Tide"),
        ("Person", "Rosa Xu", "ACTED_IN", "Movie", "Iron Harvest"),
        ("Person", "Rosa Xu", "ACTED_IN", "Movie", "Silent Run"),
    }
    _, rels2 = _cr().extract_document("Rosa Xu acted in Sand and Fog.")
    assert _triples(rels2) == {
        ("Person", "Rosa Xu", "ACTED_IN", "Movie", "Sand and Fog"),
    }


def test_comma_list_passive_agents():
    _, rels = _cr().extract_document(
        "The Dark Tide was directed by Rosa Xu, Alan Abbott."
    )
    assert _triples(rels) == {
        ("Person", "Rosa Xu", "DIRECTED", "Movie", "The Dark Tide"),
        ("Person", "Alan Abbott", "DIRECTED", "Movie", "The Dark Tide"),
    }


def test_comma_series_does_not_swallow_coordinate_clause():
    """ADVICE r02: 'X directed Y, and Z produced W.' — Z is the subject of
    the second clause, not a second object of DIRECTED."""
    _, rels = _cr().extract_document(
        "Lana Wachowski directed Speed Racer, and Alan Smithee acted in "
        "Hope Floats."
    )
    assert _triples(rels) == {
        ("Person", "Lana Wachowski", "DIRECTED", "Movie", "Speed Racer"),
        ("Person", "Alan Smithee", "ACTED_IN", "Movie", "Hope Floats"),
    }
    # series + trailing coordinate clause: both series members kept
    _, rels2 = _cr().extract_document(
        "Ana Reyes directed Iron Harvest, Silent Run, and Mira Voss "
        "acted in Glass City."
    )
    t2 = _triples(rels2)
    assert ("Person", "Ana Reyes", "DIRECTED", "Movie", "Iron Harvest") in t2
    assert ("Person", "Ana Reyes", "DIRECTED", "Movie", "Silent Run") in t2
    assert ("Person", "Ana Reyes", "DIRECTED", "Movie", "Mira Voss") not in t2
    assert ("Person", "Mira Voss", "ACTED_IN", "Movie", "Glass City") in t2
    # passive coordinate clause terminator ('was')
    _, rels3 = _cr().extract_document(
        "Rosa Xu directed The Dark Tide, and Glass City was directed by "
        "Alan Abbott."
    )
    t3 = _triples(rels3)
    assert ("Person", "Rosa Xu", "DIRECTED", "Movie", "Glass City") not in t3
    assert ("Person", "Alan Abbott", "DIRECTED", "Movie", "Glass City") in t3
    # a series whose member contains a connector ('Sand and Fog') is NOT
    # terminated by the guard (verbs only, lowercase-matched)
    _, rels4 = _cr().extract_document(
        "Rosa Xu acted in The Dark Tide, Sand and Fog."
    )
    assert ("Person", "Rosa Xu", "ACTED_IN", "Movie", "Sand and Fog") in (
        _triples(rels4)
    )


def test_appositive_typing():
    ents, _ = _cr().extract_document(
        "Rosa Xu, a Person, lives quietly. The Dark Tide is a Movie."
    )
    got = {(e["label"], e["key"]) for e in ents}
    assert ("Person", "Rosa Xu") in got
    assert ("Movie", "The Dark Tide") in got


def test_possessive_attribute():
    ents, _ = _cr().extract_document(
        "The Dark Tide's release year is 1999."
    )
    by_key = {(e["label"], e["key"]): e["attributes"] for e in ents}
    assert by_key[("Movie", "The Dark Tide")]["release_year"] == "1999"
