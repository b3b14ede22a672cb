"""Deterministic ontology inference from documents (EP2, SURVEY §3).

The reference's `Ontology.from_sources`
(/root/reference/graphrag_sdk/ontology.py:36-58 ->
steps/create_ontology_step.py) fans each document out to an LLM that
proposes a partial ontology, merges the partials (`merge_with` = J2/J3) and
runs an LLM "fix" pass (J4/J5/A4). The engine keeps the same
map -> merge -> fix shape with deterministic rules:

map (per document, inside `mapInPandas` — same batching as extraction):
- copula typing sentences ("X is a Person.") define entity labels;
- attribute sentences ("The release year of X is 1999.") define attributes
  on the label X is typed as *on the same page*; values that parse as
  numbers type the attribute `number`, true/false -> `boolean`,
  else `string`;
- verb phrases between two typed mentions ("X directed Y") define relations
  label = UPPER_SNAKE(verb phrase), source/target = the mentions' labels.

merge (driver): `Ontology.merge_with` over per-partition partials — union by
label with attribute union (the reference's exact merge, minus the race it
has at create_ontology_step.py:77,144).

fix (driver): discard relations with missing endpoints, then entities with
no relations (J4/J5), then mark each entity's first attribute unique if none
is (A4 analogue — the reference asks the LLM to invent a unique attribute;
we promote deterministically, defaulting to a synthesized `name`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from kgforge.ontology import Attribute, Entity, Ontology, Relation

_CAP = r"[A-Z0-9][\w'&.\-]*"
_CONN = r"(?:of|the|and|in|a)"
_MENTION = rf"{_CAP}(?:[ \t]+(?:{_CONN}[ \t]+)*{_CAP})*"
_TYPING = re.compile(rf"\b({_MENTION})\s+is\s+an?\s+([A-Z][A-Za-z0-9_]*)\b")
_ATTR = re.compile(
    rf"\bthe\s+([a-z][a-z ]*?)\s+of\s+({_MENTION})\s+is\s+([^.!?]+?)\s*[.!?]",
    re.IGNORECASE,
)
# verb phrase between two mentions: lowercase words (optionally "was ... by")
_REL = re.compile(
    rf"\b({_MENTION})\s+((?:[a-z]+\s+){{1,3}}?)({_MENTION})"
)
_SENT_SPLIT = re.compile(r"(?<=[.!?])(?<![A-Z]\.)\s+|\n+")
# "has"/"have" stay: "has genre" -> HAS_GENRE (auxiliaries that carry the
# relation name); pure copulas are filtered before this list applies
_STOP_VERBS = {"is", "was", "are", "were", "the", "a", "an"}


def _clean(key: str) -> str:
    """Trim whitespace + sentence-final period (kept on initials like 'J.')."""
    key = key.strip()
    if key.endswith(".") and len(key.rsplit(" ", 1)[-1]) > 2:
        key = key[:-1]
    return key


def _value_type(v: str) -> str:
    v = v.strip()
    if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?", v):
        return "number"
    if v.lower() in ("true", "false"):
        return "boolean"
    return "string"


def infer_partial(text: str) -> dict:
    """One document -> partial ontology JSON (the reference's per-doc IR)."""
    typed: dict[str, str] = {}
    attrs: dict[str, dict[str, str]] = {}
    rels: set[tuple[str, str, str]] = set()
    sentences = [s for s in _SENT_SPLIT.split(text) if s and len(s) <= 2000]
    for s in sentences:
        for m in _TYPING.finditer(s):
            typed[_clean(m.group(1))] = m.group(2)
    for s in sentences:
        for m in _ATTR.finditer(s):
            name, subject, value = m.group(1), _clean(m.group(2)), m.group(3)
            label = typed.get(subject)
            if label:
                attrs.setdefault(label, {})[
                    name.strip().lower().replace(" ", "_")
                ] = _value_type(value)
        for m in _REL.finditer(s):
            a, verb, b = _clean(m.group(1)), m.group(2).strip(), _clean(m.group(3))
            la, lb = typed.get(a), typed.get(b)
            words = [w for w in verb.split() if w]
            if not la or not lb or not words:
                continue
            if words[0] in ("is", "are"):
                continue
            if words[0] == "was" and words[-1] == "by":
                # passive voice: "Y was directed by X" -> X DIRECTED Y
                core = [w for w in words[1:-1] if w not in _STOP_VERBS]
                if core:
                    rels.add(("_".join(core).upper(), lb, la))
                continue
            core = [w for w in words if w not in _STOP_VERBS]
            if core:
                rels.add(("_".join(core).upper(), la, lb))
    return {
        "entities": [
            {
                "label": label,
                "attributes": [
                    {"name": n, "type": t, "unique": False, "required": False}
                    for n, t in sorted(attrs.get(label, {}).items())
                ],
            }
            for label in sorted(set(typed.values()))
        ],
        "relations": [
            {
                "label": r[0],
                "source": {"label": r[1]},
                "target": {"label": r[2]},
                "attributes": [],
            }
            for r in sorted(rels)
        ],
    }


def fix_ontology(onto: Ontology) -> Ontology:
    """The deterministic L2 pass: J4 + J5 + A4 (create_ontology_step.py:150-203)."""
    onto = onto.discard_relations_without_entities()
    onto = onto.discard_entities_without_relations()
    for e in onto.entities:
        if not e.unique_attributes():
            target = next(
                (a for a in e.attributes if a.type == "string"), None
            )
            if target is not None:
                target.unique = True
                target.required = True
            else:
                # no string attribute observed: synthesize a `name` key —
                # the reference asks the LLM to invent one (prompts.py:217-233)
                e.attributes.append(Attribute("name", "string", True, True))
    return onto


def ontology_from_pages(
    pages: DataFrame, text_col: str = "text", sample: int | None = None
) -> Ontology:
    """EP2: pages/documents DataFrame -> inferred + fixed Ontology.

    The per-document map runs distributed (mapInPandas emitting partial
    ontology JSON), partials merge per partition, and only the tiny merged
    partials reach the driver — the reference collected every LLM response
    on the driver thread pool instead.
    """
    import json

    import pandas as pd

    df = pages.select(text_col)
    if sample:
        df = df.limit(sample)

    def run(batches):
        for pdf in batches:
            merged: Ontology | None = None
            for text in pdf[text_col]:
                if not text:
                    continue
                part = Ontology.from_json(infer_partial(text))
                merged = part if merged is None else merged.merge_with(part)
            if merged is not None:
                yield pd.DataFrame({"part": [json.dumps(merged.to_json())]})

    partials = df.mapInPandas(run, schema="part string").collect()
    merged: Ontology | None = None
    for row in partials:
        part = Ontology.from_json(row.part)
        merged = part if merged is None else merged.merge_with(part)
    if merged is None:
        return Ontology(entities=[], relations=[])
    return fix_ontology(merged)
