"""Deterministic synthetic Common-Crawl-style `pages` corpus + gold triples.

Schema (BASELINE.json input_hint): pages(url string, warc_ts timestamp,
html binary, text string, lang string). The generator follows FIXTURES.md §1:

- hosts drawn Zipf-skewed from a small pool (exercises url-host bucketing and
  hot-host skew);
- duplicate urls with later warc_ts (exercises last-write-wins node dedup,
  SURVEY §2.4 A1);
- html wraps fact sentences in boilerplate (<script>/<style>/nav) so
  get_text() parity is non-trivial;
- a seeded ground-truth fact graph yields gold_triples / gold_nodes for the
  P/R >= 0.95 gate, and alias surface forms for the entity-linking fixture
  (one Zipf-head super-node to exercise skew salting).

Everything is driven by random.Random(seed) — two calls with the same args
produce byte-identical corpora on any machine.
"""

from __future__ import annotations

import datetime as dt
import json
import random
import zlib
from dataclasses import dataclass, field

from kgforge.ontology import Ontology

# ---------------------------------------------------------------- ontology

MOVIES_ONTOLOGY_JSON = {
    "entities": [
        {
            "label": "Person",
            "attributes": [
                {"name": "name", "type": "string", "unique": True, "required": True}
            ],
        },
        {
            "label": "Movie",
            "attributes": [
                {"name": "title", "type": "string", "unique": True, "required": True},
                {"name": "release_year", "type": "number", "unique": False},
                {"name": "rating", "type": "string", "unique": False},
            ],
        },
        {
            "label": "Genre",
            "attributes": [
                {"name": "name", "type": "string", "unique": True, "required": True}
            ],
        },
    ],
    "relations": [
        {
            "label": "DIRECTED",
            "source": {"label": "Person"},
            "target": {"label": "Movie"},
            "attributes": [],
        },
        {
            "label": "ACTED_IN",
            "source": {"label": "Person"},
            "target": {"label": "Movie"},
            "attributes": [
                {"name": "role", "type": "string", "unique": False}
            ],
        },
        {
            "label": "HAS_GENRE",
            "source": {"label": "Movie"},
            "target": {"label": "Genre"},
            "attributes": [],
        },
    ],
}


def movies_ontology() -> Ontology:
    return Ontology.from_json(MOVIES_ONTOLOGY_JSON)


# ---------------------------------------------------------------- name pools

_FIRST = [
    "Alan", "Brenda", "Carlos", "Dana", "Elif", "Farid", "Grace", "Hiro",
    "Ingrid", "Jonas", "Keiko", "Liam", "Mona", "Nikhil", "Olga", "Pedro",
    "Quinn", "Rosa", "Stefan", "Tara", "Umar", "Vera", "Walter", "Ximena",
    "Yusuf", "Zelda",
]
_LAST = [
    "Abbott", "Baranov", "Castillo", "Dufresne", "Eriksen", "Fontaine",
    "Guerrero", "Hashimoto", "Ivanova", "Jimenez", "Kowalski", "Lindqvist",
    "Moreau", "Nakamura", "Okafor", "Petrov", "Quintana", "Rahman",
    "Silva", "Takahashi", "Ueda", "Vasquez", "Weber", "Xu", "Yamada", "Zhang",
]
_TITLE_A = [
    "Dark", "Silent", "Golden", "Broken", "Crimson", "Frozen", "Hidden",
    "Hollow", "Iron", "Lost", "Midnight", "Pale", "Quiet", "Scarlet",
    "Shattered", "Solar", "Stolen", "Velvet", "Wild", "Winter",
]
_TITLE_B = [
    "Tide", "Harvest", "Compass", "Garden", "Anthem", "Bridge", "Canyon",
    "Cipher", "Ember", "Fortress", "Harbor", "Lantern", "Meridian", "Orchard",
    "Paradox", "Quarry", "River", "Signal", "Summit", "Voyage",
]
_GENRES = [
    "Thriller", "Comedy", "Drama", "Noir", "Western", "Documentary",
    "Animation", "Horror", "Romance", "Adventure",
]
_HOSTS = [
    "films.example.com", "cinema.example.org", "reviews.example.net",
    "archive.example.io", "news.example.co", "blog.example.dev",
    "wiki.example.edu", "mag.example.info",
]
_NOISE_WORDS = (
    "the a when while because beyond across during festival premiere studio "
    "critics audiences weekend screening award ceremony ticket theater camera "
    "scene script budget producer crew lighting soundtrack sequel franchise"
).split()


@dataclass
class GoldCorpus:
    """Generated corpus + ground truth."""

    pages: list[dict] = field(default_factory=list)   # url, warc_ts, html, text, lang
    triples: list[dict] = field(default_factory=list)
    nodes: list[dict] = field(default_factory=list)   # label, key, props(json str)
    aliases: list[dict] = field(default_factory=list)  # mention, canonical, label


def _alias_forms(name: str, rng: random.Random) -> list[str]:
    """Surface-form variants of 'First Last' used for entity-linking gold."""
    first, last = name.split(" ", 1)
    forms = [f"{first[0]}. {last}", f"{first} {last[0]}.", name.upper()]
    rng.shuffle(forms)
    return forms


_HTML_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
body {{ font-family: serif; color: #222; }}
.nav {{ display: none; }}
</style>
<script type="text/javascript">
var pageId = "{page_id}";
function track() {{ console.log("view", pageId); }}
</script>
</head>
<body>
<nav class="nav">Home | Movies | Reviews | About</nav>
<h1>{title}</h1>
{body}
<template><span>promo-placeholder</span></template>
<footer>
<p>Copyright 2024 Example Media. All rights reserved.</p>
</footer>
</body>
</html>"""


def generate_corpus(
    n_pages: int = 200,
    seed: int = 42,
    dup_url_frac: float = 0.1,
    alias_frac: float = 0.25,
    noise_sentences: int = 3,
    type_all_entities: bool = False,
) -> GoldCorpus:
    """Seeded fact graph -> rendered pages + gold triples/nodes/aliases.

    type_all_entities=True additionally emits copula typing sentences for
    the page's movie and genre ("The X Y is a Movie.") — the EP2
    ontology-inference fixture, where entity labels must be recoverable
    from the text alone. Default off (original corpus unchanged).
    """
    rng = random.Random(seed)
    onto = movies_ontology()

    n_movies = max(4, n_pages // 2)
    n_people = max(6, n_pages)

    def draw_unique(n: int, sample, universe):
        """Random draws while the pool lasts, then deterministic enumeration
        of the unused remainder (the 2-word/2-token pools are finite — 400
        titles, 676 people — so large corpora would otherwise loop forever)."""
        out, seen, misses = [], set(), 0
        while len(out) < n and misses < 20 * max(1, len(out) + 1):
            v = sample()
            if v in seen:
                misses += 1
                continue
            seen.add(v)
            out.append(v)
        if len(out) < n:
            for v in universe():
                if v not in seen:
                    seen.add(v)
                    out.append(v)
                    if len(out) == n:
                        break
        # a saturated universe is fine: names are reused across more pages
        # (each movie/person already spans multiple pages by construction)
        return out

    def movie_universe():
        for a in _TITLE_A:
            for b in _TITLE_B:
                yield f"The {a} {b}"
        for c in _TITLE_B:
            for a in _TITLE_A:
                for b in _TITLE_B:
                    if b != c:
                        yield f"The {a} {b} {c}"
        for a2 in _TITLE_A:
            for a in _TITLE_A:
                if a == a2:
                    continue
                for b in _TITLE_B:
                    yield f"The {a} {b} {a2}"

    def people_universe():
        for f in _FIRST:
            for l in _LAST:
                yield f"{f} {l}"
        for l2 in _LAST:
            for f in _FIRST:
                for l in _LAST:
                    if l != l2:
                        yield f"{f} {l}-{l2}"
        for f2 in _FIRST:
            for f in _FIRST:
                if f == f2:
                    continue
                for l in _LAST:
                    yield f"{f}-{f2} {l}"

    movies = draw_unique(
        n_movies,
        lambda: f"The {rng.choice(_TITLE_A)} {rng.choice(_TITLE_B)}",
        movie_universe,
    )
    people = draw_unique(
        n_people,
        lambda: f"{rng.choice(_FIRST)} {rng.choice(_LAST)}",
        people_universe,
    )

    # the Zipf-head super-node genre: appears on most pages (skew fixture)
    hot_genre = _GENRES[0]

    corpus = GoldCorpus()
    gold_nodes: dict[tuple, dict] = {}
    gold_triples: set[tuple] = set()
    triple_props: dict[tuple, dict] = {}

    def note_node(label: str, key: str, props: dict | None = None):
        cur = gold_nodes.setdefault((label, key), {})
        if props:
            cur.update(props)

    def note_triple(s_l, s_k, pred, o_l, o_k, props=None):
        t = (s_l, s_k, pred, o_l, o_k)
        gold_triples.add(t)
        if props:
            triple_props.setdefault(t, {}).update(props)

    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    alias_people = set(rng.sample(people, int(len(people) * alias_frac)))
    for p in sorted(alias_people):
        for form in _alias_forms(p, rng):
            corpus.aliases.append(
                {"mention": form, "canonical": p, "label": "Person"}
            )
        corpus.aliases.append({"mention": p, "canonical": p, "label": "Person"})

    urls_emitted = []
    for i in range(n_pages):
        movie = movies[i % len(movies)]
        director = people[(i * 3) % len(people)]
        actors = [people[(i * 3 + 1) % len(people)], people[(i * 3 + 2) % len(people)]]
        year = 1960 + (i * 7) % 64
        genre = hot_genre if rng.random() < 0.6 else rng.choice(_GENRES[1:])
        role = f"{rng.choice(_FIRST)} the {rng.choice(_TITLE_B)}"

        host = _HOSTS[min(int(rng.paretovariate(1.2)) - 1, len(_HOSTS) - 1)]
        url = f"https://{host}/movies/{i:05d}"
        warc_ts = base_ts + dt.timedelta(minutes=i)

        sentences = []
        # relation sentences — varied voice
        if rng.random() < 0.5:
            sentences.append(f"{director} directed {movie}.")
        else:
            sentences.append(f"{movie} was directed by {director}.")
        a0 = actors[0]
        a0_surface = a0
        if a0 in alias_people and rng.random() < 0.5:
            a0_surface = _alias_forms(a0, random.Random(zlib.crc32(a0.encode())))[0]
            # the most-complete identifier must exist somewhere in the corpus
            # for coreference to resolve to it (prompts.py:19-20 presumes the
            # full form is seen); real pages state it at least once.
            sentences.append(f"{a0} is a Person.")
        sentences.append(f"{a0_surface} acted in {movie} as {role}.")
        sentences.append(f"{actors[1]} acted in {movie}.")
        sentences.append(f"{movie} has genre {genre}.")
        # attribute sentence
        sentences.append(f"The release year of {movie} is {year}.")
        # standalone typed entity
        extra_person = people[(i * 5 + 3) % len(people)]
        sentences.append(f"{extra_person} is a Person.")
        if type_all_entities:
            sentences.append(f"{movie} is a Movie.")
            sentences.append(f"{genre} is a Genre.")
            sentences.append(f"{director} is a Person.")
        # noise sentences (no gold impact; test precision)
        for _ in range(noise_sentences):
            ws = " ".join(rng.choice(_NOISE_WORDS) for _ in range(rng.randint(6, 12)))
            sentences.append(ws.capitalize() + ".")
        rng.shuffle(sentences)

        body = "\n".join(f"<p>{s}</p>" for s in sentences)
        html = _HTML_TEMPLATE.format(title=movie, page_id=f"pg{i}", body=body)

        from kgforge.sources.html import html_to_text

        text = html_to_text(html)
        corpus.pages.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "en" if rng.random() > 0.05 else rng.choice(["de", "fr"]),
            }
        )
        urls_emitted.append((url, warc_ts, html))

        # gold bookkeeping (canonical names — linking resolves aliases)
        note_node("Person", director, {"name": director})
        note_node("Person", a0, {"name": a0})
        note_node("Person", actors[1], {"name": actors[1]})
        note_node("Person", extra_person, {"name": extra_person})
        note_node("Movie", movie, {"title": movie, "release_year": float(year)})
        note_node("Genre", genre, {"name": genre})
        note_triple("Person", director, "DIRECTED", "Movie", movie)
        note_triple("Person", a0, "ACTED_IN", "Movie", movie, {"role": role})
        note_triple("Person", actors[1], "ACTED_IN", "Movie", movie)
        note_triple("Movie", movie, "HAS_GENRE", "Genre", genre)

    # duplicate re-crawls: same url, later warc_ts, same facts (A1 fixture)
    n_dups = int(n_pages * dup_url_frac)
    for j in range(n_dups):
        url, warc_ts, html = urls_emitted[j * 2 % len(urls_emitted)]
        from kgforge.sources.html import html_to_text

        corpus.pages.append(
            {
                "url": url,
                "warc_ts": warc_ts + dt.timedelta(days=1),
                "html": html.encode("utf-8"),
                "text": html_to_text(html),
                "lang": "en",
            }
        )

    for (label, key), props in sorted(gold_nodes.items()):
        corpus.nodes.append(
            {"label": label, "key": key, "props": json.dumps(props, sort_keys=True)}
        )
    for t in sorted(gold_triples):
        corpus.triples.append(
            {
                "subj_label": t[0],
                "subj_key": t[1],
                "pred": t[2],
                "obj_label": t[3],
                "obj_key": t[4],
                "props": json.dumps(triple_props.get(t, {}), sort_keys=True),
            }
        )
    assert onto.validate_entities()
    return corpus


def corpus_to_spark(spark, corpus: GoldCorpus):
    """Materialize the corpus as Spark DataFrames (pages, gold_triples, gold_nodes)."""
    from pyspark.sql import types as T

    pages_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    pages = spark.createDataFrame(
        [
            (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
            for p in corpus.pages
        ],
        pages_schema,
    )
    triples = spark.createDataFrame(
        [
            (
                t["subj_label"],
                t["subj_key"],
                t["pred"],
                t["obj_label"],
                t["obj_key"],
                t["props"],
            )
            for t in corpus.triples
        ],
        "subj_label string, subj_key string, pred string, obj_label string, "
        "obj_key string, props string",
    )
    nodes = spark.createDataFrame(
        [(n["label"], n["key"], n["props"]) for n in corpus.nodes],
        "label string, key string, props string",
    )
    return pages, triples, nodes


def write_corpus_parquet(spark, corpus: GoldCorpus, out_dir: str) -> None:
    pages, triples, nodes = corpus_to_spark(spark, corpus)
    pages.write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")
    triples.write.mode("overwrite").parquet(f"{out_dir}/gold_triples.parquet")
    nodes.write.mode("overwrite").parquet(f"{out_dir}/gold_nodes.parquet")
