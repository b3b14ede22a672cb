"""Template ("wrapper") extraction — layout-aware deterministic IE.

The reference hands arbitrary page layouts to an LLM (ref
graphrag_sdk/steps/extract_data_step.py:119-176); a deterministic engine
needs explicit layout knowledge for pages whose facts live in DOM structure
rather than sentences (stat tables, credit lists). This module supplies
that knowledge as *wrappers*: small template extractors induced from the
reference's own fixture corpora, in the classic wrapper-induction sense.

Each wrapper:

- declares what it consumes (``needs`` = "html" or "text");
- detects applicability per document with a cheap regex (non-matching docs
  cost one regex scan);
- emits the same entity/relation IR the sentence grammar emits, with
  ontology labels supplied via a ``bindings`` dict so the template logic is
  reusable against a renamed ontology;
- runs INSIDE the existing `mapInPandas` extraction UDF (operators/
  extract.py) — no extra Spark stage, no shuffle, partition-parallel.

Wrappers shipped:

- ``ufc_fight_stats``: sports-statistics.com UFC fight pages (the
  reference's examples/data/ufc corpus, 767 pages; ontology
  examples/ufc/ontology.json). Parses the *DOM* (breadcrumb, h1, fight
  meta, fighter columns, result list, totals table) because bs4-flattened
  text destroys table-cell boundaries (adjacent numeric cells concatenate
  irrecoverably, e.g. "248196"). This is why `extract_ir` can take an
  ``html_col``: structure-bearing pages are extracted from structure,
  exactly as a production web-KG system would.
- ``imdb_title_credits``: IMDb-style title pages (the reference's
  tests/data/madoff.txt fixture, asserted in ref tests/test_kg_openai.py:
  78-98). Text-based: title line "X (YYYY)" + the "Top cast" block, whose
  line groups are [name, name, role] (link + image alt double the name) or
  [name, role].

Ontology constraint: wrappers only bind to labels the caller provides; the
extraction UDF additionally drops any emitted label unknown to the compiled
ontology rules, and normalize.filter_to_ontology remains the downstream
safety net (P6/P7).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "January February March April May June July August September "
        "October November December".split()
    )
}

_WS = re.compile(r"\s+")


def _ws(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _norm_date(s: str) -> str | None:
    """'January 21, 2023' -> '2023-01-21' (the reference's prompt contract:
    dates always YYYY-MM-DD, ref fixtures/prompts.py:240,346)."""
    m = re.match(r"([A-Z][a-z]+) (\d{1,2}), (\d{4})", s)
    if not m or m.group(1) not in _MONTHS:
        return None
    return f"{int(m.group(3)):04d}-{_MONTHS[m.group(1)]:02d}-{int(m.group(2)):02d}"


class Wrapper:
    """Base template extractor. Subclasses set `name`, `needs`, `exclusive`,
    `default_bindings` and implement `matches` + `extract`."""

    name = ""
    needs = "text"  # which column the wrapper consumes: "text" | "html"
    #: exclusive wrappers suppress the sentence grammar for matching docs
    #: (pure-template pages where free-text rules only add noise)
    exclusive = False
    default_bindings: dict = {}

    def __init__(self, bindings: dict | None = None):
        self.bindings = {**self.default_bindings, **(bindings or {})}

    def matches(self, content: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def extract(self, content: str):  # pragma: no cover - interface
        """-> (entities, relations): entities [(label, key, {attr: val})],
        relations [(label, src_label, src_key, dst_label, dst_key, {a: v})].
        """
        raise NotImplementedError


# ---------------------------------------------------------------------------
# UFC fight-statistics pages (DOM-based)
# ---------------------------------------------------------------------------

# totals-table row label -> (ontology attribute name, value shape)
# (attribute names from the reference's shipped examples/ufc/ontology.json)
_STAT_ATTRS = {
    "Knockdowns": ("knockdowns", "int"),
    "Significant Strikes": ("significant_strikes", "of"),
    "Significant Strikes Attempted": ("significant_strikes_attempted", "int"),
    "Significant Strikes %": ("significant_strikes_percentage", "pct"),
    "Total Strikes": ("total_strikes", "int"),
    "Total Strikes Attempted": ("total_strikes_attempted", "int"),
    "Takedowns": ("takedowns", "of"),
    "Takedowns Attempted": ("takedowns_attempted", "int"),
    "Takedown %": ("takedown_percentage", "pct"),
    "Submissions Attempted": ("submissions_attempted", "int"),
    "Passes": ("passes", "int"),
    "Reversals": ("reversals", "int"),
}


def _stat_value(raw: str, kind: str) -> str:
    raw = _ws(raw)
    if kind == "of":  # "75 of 160" -> landed count
        return raw.split(" of ")[0]
    if kind == "pct":  # "46.88%" -> "46.88", "0%" -> "0"
        return raw.rstrip("%")
    return raw


class _UfcDom(HTMLParser):
    """Single-pass DOM scan collecting exactly the template slots."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.crumbs: list[str] = []
        self.h1 = ""
        self.meta = ""
        self.fighter_cols: list[str] = []
        self.summary_items: list[str] = []
        self.cells: list[tuple[str, str]] = []  # (tag, text) in totals table
        # parser state
        self._depth = 0
        self._crumb_until = self._h1_until = self._meta_until = 0
        self._col_until = self._sum_until = self._li_until = 0
        self._h2_until = 0
        self._h2_buf: list[str] = []
        self._await_table = False
        self._in_totals = 0
        self._cell_tag = ""
        self._cell_buf: list[str] = []

    _VOID = frozenset(
        "area base br col embed hr img input link meta param source track "
        "wbr".split()
    )

    def handle_starttag(self, tag, attrs):
        if tag in self._VOID:
            if tag == "br" and self._col_until:
                self.fighter_cols[-1] += "\n"
            return
        self._depth += 1
        a = dict(attrs)
        cls = a.get("class", "")
        if tag == "span" and a.get("itemprop") == "name":
            self._crumb_until = self._depth
            self.crumbs.append("")
        elif tag == "h1":
            self._h1_until = self._depth
        elif tag == "h2":
            self._h2_until = self._depth
            self._h2_buf = []
        elif tag == "div" and "fight_meta" in cls:
            self._meta_until = self._depth
        elif tag == "div" and "topcolumn" in cls:
            self._col_until = self._depth
            self.fighter_cols.append("")
        elif tag == "div" and "fight_summary_ufc" in cls:
            self._sum_until = self._depth
        elif tag == "li" and self._sum_until:
            self._li_until = self._depth
            self.summary_items.append("")
        elif tag == "table" and self._await_table:
            self._in_totals = self._depth
            self._await_table = False
        elif self._in_totals and tag in ("td", "th"):
            self._cell_tag = tag
            self._cell_buf = []

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and self._col_until:
            self.fighter_cols[-1] += "\n"

    def handle_endtag(self, tag):
        if self._in_totals and tag in ("td", "th") and self._cell_tag:
            self.cells.append((self._cell_tag, "".join(self._cell_buf)))
            self._cell_tag = ""
        if tag == "table" and self._in_totals:
            # unclosed <tr>s inside the table drift the depth counter, so
            # any </table> while collecting terminates the totals table
            # (the page never nests tables)
            self._in_totals = 0
        if tag == "h2" and self._h2_until == self._depth:
            if _ws("".join(self._h2_buf)) == "Fight Totals":
                self._await_table = True
        for attr in ("_crumb_until", "_h1_until", "_meta_until",
                     "_col_until", "_sum_until", "_li_until", "_h2_until"):
            if getattr(self, attr) == self._depth:
                setattr(self, attr, 0)
        self._depth = max(0, self._depth - 1)

    def handle_data(self, data):
        if self._cell_tag:
            self._cell_buf.append(data)
        if self._crumb_until:
            self.crumbs[-1] += data
        if self._h1_until:
            self.h1 += data
        if self._h2_until:
            self._h2_buf.append(data)
        if self._meta_until:
            self.meta += data
        if self._col_until:
            self.fighter_cols[-1] += data
        if self._li_until:
            self.summary_items[-1] += data


class UfcFightStats(Wrapper):
    """sports-statistics.com UFC fight-stat page template.

    Induced from /root/reference/examples/data/ufc (all 8 method variants:
    unanimous/split/majority decision, KO/TKO, submission, doctor's
    stoppage, DQ, could-not-continue); emits the reference UFC ontology's
    Event/Fight/Fighter/FightStatistics graph per page.
    """

    name = "ufc_fight_stats"
    needs = "html"
    exclusive = True
    default_bindings = {
        "event": "Event",
        "fight": "Fight",
        "fighter": "Fighter",
        "stats": "FightStatistics",
        "part_of": "PART_OF",
        "participated_in": "PARTICIPATED_IN",
        "related_stats": "RELATED_STATS",
        "has_stats": "HAS_STATS",
    }

    _DETECT = re.compile(r"Fight Statistics</h1>|fighter_row_top_ufc")

    def matches(self, content: str) -> bool:
        return bool(self._DETECT.search(content))

    def extract(self, content: str):
        b = self.bindings
        dom = _UfcDom()
        dom.feed(content)
        dom.close()

        ents: list[tuple] = []
        rels: list[tuple] = []
        fight = re.sub(r"\s*Fight Statistics$", "", _ws(dom.h1))
        event = _ws(dom.crumbs[-1]) if len(dom.crumbs) >= 3 else ""
        if not fight:
            return ents, rels

        if event:
            eattrs = {"title": event}
            meta = _ws(dom.meta)
            date = _norm_date(meta)
            if date:
                eattrs["date"] = date
                loc = _ws(re.sub(r"^[A-Z][a-z]+ \d{1,2}, \d{4},\s*", "", meta))
                if loc:
                    eattrs["location"] = loc
            ents.append((b["event"], event, eattrs))
            rels.append((b["part_of"], b["fight"], fight, b["event"], event, {}))

        summary = {}
        for item in dom.summary_items:
            k, _, v = item.partition(":")
            summary[_ws(k)] = _ws(v)
        fattrs = {"title": fight}
        for attr, src in (("method", "Method"), ("rounds", "Round"),
                          ("referee", "Referee"), ("result_details", "Details")):
            if summary.get(src):
                fattrs[attr] = summary[src]
        ents.append((b["fight"], fight, fattrs))

        fighters: list[str] = []
        for col in dom.fighter_cols:
            m = re.match(r"(.+?) \((Win|Loss|Draw|No Contest|NC)\)", _ws(col))
            if not m:
                continue
            name, outcome = _ws(m.group(1)), m.group(2)
            attrs = {"name": name, "outcome": outcome}
            nick = re.search(r'"([^"]+)"', col)
            if nick:
                attrs["nickname"] = _ws(nick.group(1))
            fighters.append(name)
            ents.append((b["fighter"], name, attrs))
            rels.append(
                (b["participated_in"], b["fighter"], name, b["fight"], fight, {})
            )

        # totals table: [th f1, th '', th f2] header then (td, th, td) rows
        cells = dom.cells
        header = [_ws(t) for tag, t in cells[:3] if tag == "th" and _ws(t)]
        if len(header) == 2:
            stats = [{"fighter_name": n} for n in header]
            for i in range(3, len(cells) - 2):
                if (cells[i][0], cells[i + 1][0], cells[i + 2][0]) != (
                    "td", "th", "td",
                ):
                    continue
                label = _ws(cells[i + 1][1])
                if label not in _STAT_ATTRS:
                    continue
                attr, kind = _STAT_ATTRS[label]
                for side in (0, 1):
                    raw = _ws(cells[i + 2 * side][1])
                    if raw:  # empty <td></td> carries no fact
                        stats[side][attr] = _stat_value(raw, kind)
            for st in stats:
                name = st["fighter_name"]
                ents.append((b["stats"], name, st))
                rels.append(
                    (b["related_stats"], b["stats"], name, b["fighter"], name, {})
                )
                rels.append(
                    (b["has_stats"], b["fight"], fight, b["stats"], name, {})
                )
        return ents, rels


# ---------------------------------------------------------------------------
# IMDb-style title page with credits block (text-based)
# ---------------------------------------------------------------------------

class ImdbTitleCredits(Wrapper):
    """IMDb title-page template: "Title (YYYY)" + "Top cast" credit block.

    Induced from the reference's tests/data/madoff.txt (bs4-flattened IMDb
    page; ref tests/test_kg_openai.py:78-98 asserts actor extraction from
    it). The credits block lists each performer as [name, name, role]
    (anchor text + image alt duplicate the name) or [name, role].
    """

    name = "imdb_title_credits"
    needs = "text"
    exclusive = False
    default_bindings = {
        "person": "Actor",
        "work": "Movie",
        "credit": "ACTED_IN",
        "role_attr": "role",
        "header": "Top cast",
        "end_markers": ("All cast & crew",),
    }

    _TITLE = re.compile(r"^(.+?) \((\d{4})\)$")

    def matches(self, content: str) -> bool:
        return f"\n{self.bindings['header']}\n" in content

    def extract(self, content: str):
        b = self.bindings
        lines = [l.strip() for l in content.split("\n")]
        title = next(
            (m.group(1) for l in lines if (m := self._TITLE.match(l))), None
        )
        ents: list[tuple] = []
        rels: list[tuple] = []
        if title is None:
            return ents, rels
        ents.append((b["work"], title, {"title": title}))
        try:
            start = lines.index(b["header"]) + 1
        except ValueError:
            return ents, rels
        block: list[str] = []
        for l in lines[start:]:
            if l in b["end_markers"]:
                break
            if l:
                block.append(l)
        i = 0
        while i < len(block) - 1:
            if i + 2 < len(block) and block[i] == block[i + 1]:
                name, role = block[i], block[i + 2]
                i += 3
            else:
                name, role = block[i], block[i + 1]
                i += 2
            ents.append((b["person"], name, {"name": name}))
            rels.append(
                (b["credit"], b["person"], name, b["work"], title,
                 {b["role_attr"]: role})
            )
        return ents, rels


# ---------------------------------------------------------------------------
# Structured JSON record dumps (text-based)
# ---------------------------------------------------------------------------

class JsonRecords(Wrapper):
    """Flat JSON record arrays -> entities + link relations.

    The reference feeds structured JSON files through its TEXT loader and
    asks the LLM to extract records (ref tests/test_multi_agent.py builds
    restaurants/attractions KGs from tests/data/{restaurants,cities,
    attractions}.json exactly this way). Deterministically: each record
    becomes one entity of `label` keyed by `key_field`; scalar fields
    become attributes (numbers via str()); each `links` field emits the
    target entity and a relation to it.

    `require_fields` scopes the wrapper to its record shape, so several
    differently-bound JsonRecords wrappers can ride one extraction pass
    over a mixed-document corpus (each claims only the files whose records
    carry its fields).
    """

    name = "json_records"
    needs = "text"
    exclusive = True
    default_bindings = {
        "label": "Record",
        "key_field": "name",
        "skip_fields": ("id",),
        "links": {},  # field -> (relation_label, target_label)
        "require_fields": (),
    }

    def _records(self, content: str):
        import json

        s = content.lstrip()
        if not s.startswith("["):
            return None
        try:
            data = json.loads(content)
        except ValueError:
            return None
        if not isinstance(data, list) or not data or not all(
            isinstance(r, dict) for r in data
        ):
            return None
        return data

    def matches(self, content: str) -> bool:
        data = self._records(content)
        if data is None:
            return False
        b = self.bindings
        need = set(b["require_fields"]) | {b["key_field"]}
        return need <= set(data[0])

    def extract(self, content: str):
        b = self.bindings
        ents: list[tuple] = []
        rels: list[tuple] = []
        skip = set(b["skip_fields"]) | {b["key_field"]} | set(b["links"])
        for rec in self._records(content) or []:
            key = rec.get(b["key_field"])
            if key is None:
                continue
            key = str(key)
            attrs = {b["key_field"]: key}
            for field, value in rec.items():
                if field in skip or isinstance(value, (dict, list)):
                    continue
                if value is not None:
                    attrs[field] = str(value)
            ents.append((b["label"], key, attrs))
            for field, (rel_label, target_label) in b["links"].items():
                tgt = rec.get(field)
                if tgt is None:
                    continue
                ents.append((target_label, str(tgt), {}))
                rels.append(
                    (rel_label, b["label"], key, target_label, str(tgt), {})
                )
        return ents, rels


_REGISTRY = {
    UfcFightStats.name: UfcFightStats,
    ImdbTitleCredits.name: ImdbTitleCredits,
    JsonRecords.name: JsonRecords,
}


def resolve_wrappers(specs) -> list[Wrapper]:
    """Picklable specs -> wrapper instances. A spec is a name, a
    (name, bindings) pair, or an already-built Wrapper."""
    out = []
    for spec in specs or ():
        if isinstance(spec, Wrapper):
            out.append(spec)
        elif isinstance(spec, str):
            out.append(_REGISTRY[spec]())
        else:
            name, bindings = spec
            out.append(_REGISTRY[name](bindings))
    return out
