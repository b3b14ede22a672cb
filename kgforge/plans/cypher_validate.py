"""Cypher-text validation against an ontology (reference F5 surface).

Validates stored/generated Cypher statements the way the reference does
before executing LLM-generated graph queries (ref graphrag_sdk/helpers.py:
80-213, regex fixtures graphrag_sdk/fixtures/regex.py:1-7; unit-tested in
ref tests/test_helper_validate_cypher.py). Three checks:

1. entity labels exist — only ANONYMOUS node patterns ``(:Label)`` are
   checked (the reference's ``\\(:(.*?)\\)`` regex never matches
   ``(f:Label)``; named nodes are covered by the direction check);
2. relation labels exist — likewise only anonymous ``[:LABEL]`` patterns;
3. relation directions match the ontology: for every ``[r:LABEL]`` span,
   the adjacent arrow glyphs decide source/target; a directed leg whose
   (source_label, target_label) matches no ontology relation with that
   label is an error. Undirected legs (``-[]-``) are skipped, multi-hop
   chains resolve each leg against its neighboring node patterns, and a
   comma (new MATCH pattern) resets the left context.

``validate_cypher`` returns ``None`` when valid, else the error list —
the reference's exact contract. ``validate_cypher_udf`` lifts the check to
a vectorized pandas UDF over a DataFrame column of Cypher strings (audit a
query-log table distributedly; the compiled ontology rides the closure).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from kgforge.ontology import Ontology

_ANON_NODE = re.compile(r"\(:(.*?)\)")
_ANON_EDGE = re.compile(r"\[:(.*?)\]")
_EDGE_SPAN = re.compile(r"\[.*?\]")
_EDGE_LABEL = re.compile(r"\[\s*\w*\s*:([^{\]]+)")
_NODE_SPAN = re.compile(r"\(.+:(.*?)\)")
_NODE_AFTER = re.compile(r"\(([^),]+)\)?")
_LABEL_IN_NODE = re.compile(r":([^){]+)")


def _clean_label(raw: str) -> str:
    """'var:Label {..}' / ':Label' / ':Label*1..3' fragments -> bare label.

    Stripping the `*m..n` quantifier is a deliberate deviation from the
    reference, which leaves it attached and so flags every variable-length
    leg its own prompt documents (fixtures/prompts.py:384) as 'Relation
    LABEL*1..3 not found' — bouncing valid stored queries back to the LLM.
    Here those queries are executable (plans/cypher_exec.py), so the
    validator must resolve the bare label."""
    label = raw.split(":")[1] if ":" in raw else raw
    label = label.split("{")[0] if "{" in label else label
    label = label.split("*")[0]
    return label.strip()


def validate_cypher_entities_exist(cypher: str, onto: Ontology) -> list[str]:
    known = {e.label for e in onto.entities}
    return [
        f"Entity {label} not found in ontology"
        for m in _ANON_NODE.finditer(cypher)
        if (label := _clean_label(m.group(1))) not in known
    ]


_CALL_RELTYPES = re.compile(r"relTypes\s*:\s*\[([^\]]*)\]", re.IGNORECASE)


def validate_cypher_relations_exist(cypher: str, onto: Ontology) -> list[str]:
    known = {r.label for r in onto.relations}
    errs = [
        f"Relation {label} not found in ontology"
        for m in _ANON_EDGE.finditer(cypher)
        if (label := _clean_label(m.group(1))) not in known
    ]
    # CALL algo.SPpaths/SSpaths relTypes lists name relation labels too —
    # a typo'd label there would otherwise validate and silently return
    # zero rows (beyond the reference validator, which predates CALL)
    for m in _CALL_RELTYPES.finditer(cypher):
        for item in m.group(1).split(","):
            label = item.strip().strip("'\"")
            if label and label not in known:
                errs.append(f"Relation {label} not found in ontology")
    return errs


def _leg_endpoints(cypher: str, spans: list, idx: int):
    """Resolve one edge span's (rel_label, source_label, target_label) or
    None for an undirected/unparseable leg."""
    span = spans[idx]
    label_m = _EDGE_LABEL.search(span.group(0))
    if label_m is None:
        return None
    # quantifier stripped for the same reason as _clean_label
    rel_label = label_m.group(1).split("*")[0].strip()

    before = cypher[spans[idx - 1].end() if idx > 0 else 0 : span.start()]
    # a comma starts a fresh MATCH pattern: only the segment after it is
    # this leg's left context
    before = before.rsplit(",", 1)[-1]
    after_end = spans[idx + 1].start() if idx + 1 < len(spans) else len(cypher)
    after = cypher[span.end() : after_end]

    glyph_before_m = re.search(r"([^)\],]+)$", before)
    glyph_after_m = re.match(r"([^(\[,]*)", after)
    node_before_m = _NODE_SPAN.search(before)
    node_after_m = _NODE_AFTER.search(after)
    if not (glyph_before_m and node_before_m and node_after_m):
        return None
    glyph_before = glyph_before_m.group(1).strip()
    glyph_after = glyph_after_m.group(1).strip()

    if glyph_before == "-" and glyph_after == "->":
        src_raw, dst_raw = node_before_m.group(0), node_after_m.group(0)
    elif glyph_before == "<-" and glyph_after == "-":
        src_raw, dst_raw = node_after_m.group(0), node_before_m.group(0)
    else:
        return None  # undirected leg: nothing to validate

    src_m = _LABEL_IN_NODE.search(src_raw)
    dst_m = _LABEL_IN_NODE.search(dst_raw)
    if not (src_m and dst_m):
        return None
    return rel_label, src_m.group(1).strip(), dst_m.group(1).strip()


def validate_cypher_relation_directions(
    cypher: str, onto: Ontology
) -> list[str]:
    errors = []
    spans = list(_EDGE_SPAN.finditer(cypher))
    for idx in range(len(spans)):
        leg = _leg_endpoints(cypher, spans, idx)
        if leg is None:
            continue
        rel_label, src_label, dst_label = leg
        candidates = onto.get_relations(rel_label)
        if not candidates:
            errors.append(f"Relation {rel_label} not found in ontology")
            continue
        if not any(
            r.source == src_label and r.target == dst_label
            for r in candidates
        ):
            valid = "\n".join(
                f"(:{r.source})-[:{r.label}]->(:{r.target})"
                for r in candidates
            )
            errors.append(
                f"Relation {rel_label} does not connect {src_label} to "
                f"{dst_label}. Make sure the relation direction is correct. "
                f"Valid relations:\n{valid}"
            )
    return errors


def validate_cypher(cypher: str, onto: Ontology) -> list[str] | None:
    """None when valid, else the list of errors (reference contract:
    helpers.validate_cypher returns None/errors the same way)."""
    if not cypher:
        return ["Cypher statement is empty"]
    errors = (
        validate_cypher_entities_exist(cypher, onto)
        + validate_cypher_relations_exist(cypher, onto)
        + validate_cypher_relation_directions(cypher, onto)
    )
    return errors or None


def validate_cypher_udf(onto: Ontology):
    """Vectorized column validator: cypher string -> array of errors
    (empty array = valid). The ontology is serialized into the closure as
    plain JSON, so executors rebuild it without driver round-trips."""
    onto_json = onto.to_json()

    @pandas_udf(ArrayType(StringType()))
    def _validate(cyphers: pd.Series) -> pd.Series:
        o = Ontology.from_json(onto_json)
        return cyphers.map(lambda c: validate_cypher(c or "", o) or [])

    return _validate
