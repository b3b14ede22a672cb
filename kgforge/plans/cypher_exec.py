"""Cypher-subset executor: compile read queries to DataFrame join plans.

The reference's query path LLM-generates Cypher and ships it to FalkorDB
(ref graphrag_sdk/steps/graph_query_step.py:40-82; the prompt documents the
expected query surface, fixtures/prompts.py:366-406). A reference user
switching engines brings STORED Cypher queries; this module executes the
read subset those prompts actually produce, against the materialized
`nodes(node_id, label, key, props)` / `edges(src_id, label, dst_id, props)`
tables:

    MATCH (a:L1)-[:R1]->(b:L2)<-[:R2]-(c), (d:L3) ...
    WHERE a.prop = 'x' AND b.n >= 3 AND c.name CONTAINS 'y'
    RETURN a, b.prop AS p, count(c) AS n  [DISTINCT]
    ORDER BY n DESC, p LIMIT 10

Semantics and scope:

- patterns are chains of directed legs; comma-separated patterns join on
  shared variables (cartesian when disjoint, as in Cypher). Undirected or
  variable-length legs raise (use plans/graph_query.k_hop / bfs_distances
  for traversals).
- `RETURN var` projects the node's key (the unique-attribute value — node
  identity in this engine and in the reference's MERGE). `var.prop` reads
  the props map. `count(var)` / `count(*)` / `count(DISTINCT var)`
  aggregate, grouped by the non-aggregate return items (Cypher's implicit
  grouping).
- property comparisons against numeric literals compare numerically
  (props store strings; `try_cast` double), string literals compare as
  strings.

Everything compiles to label-filtered equi-joins + hash aggregation —
Catalyst reorders/broadcasts them like any relational plan; there is no
interpreter in the loop at execution time.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CLAUSE = re.compile(
    r"\bMATCH\b|\bWHERE\b|\bRETURN\b|\bORDER\s+BY\b|\bLIMIT\b|\bSKIP\b",
    re.IGNORECASE,
)
_NODE = re.compile(r"\(\s*(\w+)?\s*(?::\s*(\w+))?\s*(\{[^}]*\})?\s*\)")
_EDGE = re.compile(r"(<-|-)\s*\[\s*(\w+)?\s*(?::\s*(\w+))?\s*\]\s*(->|-)")
_COND = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>|CONTAINS|STARTS\s+WITH|ENDS\s+WITH)"
    r"\s*('(?:[^']*)'|\"(?:[^\"]*)\"|-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)
_RET_ITEM = re.compile(
    r"^(?:(count)\s*\(\s*(DISTINCT\s+)?(\*|\w+(?:\.\w+)?)\s*\)|(\w+)(?:\.(\w+))?)"
    r"(?:\s+AS\s+(\w+))?$",
    re.IGNORECASE,
)


class CypherUnsupported(ValueError):
    """Query uses syntax outside the executed subset."""


def _split_clauses(cypher: str) -> dict:
    text = cypher.strip().rstrip(";")
    parts = []
    last = 0
    for m in _CLAUSE.finditer(text):
        parts.append((text[last:m.start()], None))
        parts.append((m.group(0).upper().replace(" ", "_"), "kw"))
        last = m.end()
    parts.append((text[last:], None))
    clauses: dict[str, list[str]] = {}
    current = None
    for chunk, kind in parts:
        if kind == "kw":
            key = "ORDER_BY" if chunk.startswith("ORDER") else chunk
            current = key
            clauses.setdefault(key, [])
        elif current and chunk.strip():
            clauses[current].append(chunk.strip())
    return clauses


def _parse_pattern(pattern: str, var_gen):
    """One comma-free pattern -> (node specs, leg list).

    node spec: var -> (label|None, inline props dict)
    leg: (src_var, rel_label|None, dst_var)
    """
    nodes: list[tuple] = []
    legs: list[tuple] = []
    pos = 0
    nm = _NODE.match(pattern, pos)
    if nm is None:
        raise CypherUnsupported(f"expected node pattern at: {pattern[pos:]!r}")

    def node_of(m):
        var = m.group(1) or next(var_gen)
        label = m.group(2)
        props = {}
        if m.group(3):
            for pm in re.finditer(
                r"(\w+)\s*:\s*('(?:[^']*)'|\"[^\"]*\"|-?\d+(?:\.\d+)?)",
                m.group(3),
            ):
                props[pm.group(1)] = pm.group(2).strip("'\"")
        return var, label, props

    prev = node_of(nm)
    nodes.append(prev)
    pos = nm.end()
    while pos < len(pattern):
        em = _EDGE.match(pattern, pos)
        if em is None:
            if pattern[pos:].strip():
                raise CypherUnsupported(
                    f"expected edge at: {pattern[pos:]!r}"
                )
            break
        left, _rel_var, rel_label, right = em.groups()
        pos = em.end()
        nm = _NODE.match(pattern, pos)
        if nm is None:
            raise CypherUnsupported(f"expected node at: {pattern[pos:]!r}")
        cur = node_of(nm)
        nodes.append(cur)
        pos = nm.end()
        if left == "-" and right == "->":
            legs.append((prev[0], rel_label, cur[0]))
        elif left == "<-" and right == "-":
            legs.append((cur[0], rel_label, prev[0]))
        else:
            raise CypherUnsupported(
                "undirected legs are not executable (direction carries "
                "meaning in the property graph); use graph_query helpers"
            )
        prev = cur
    return nodes, legs


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside (), [], {} and quotes."""
    out, depth, last, quote = [], 0, 0, None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return [p.strip() for p in out if p.strip()]


def run_cypher(cypher: str, nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Execute a read-only Cypher query against the graph tables."""
    clauses = _split_clauses(cypher)
    if "MATCH" not in clauses or "RETURN" not in clauses:
        raise CypherUnsupported("only MATCH ... RETURN queries are executed")
    if "SKIP" in clauses:
        raise CypherUnsupported("SKIP is not supported")
    counter = iter(range(10_000))
    var_gen = (f"_anon{i}" for i in counter)

    var_specs: dict[str, tuple] = {}
    all_legs: list[tuple] = []
    pattern_groups: list[list[str]] = []  # vars per comma-pattern
    for match_text in clauses["MATCH"]:
        for pat in _split_top_commas(match_text):
            pnodes, plegs = _parse_pattern(pat, var_gen)
            group = []
            for var, label, props in pnodes:
                if var in var_specs:
                    old_label, old_props = var_specs[var]
                    label = label or old_label
                    props = {**old_props, **props}
                var_specs[var] = (label, props)
                group.append(var)
            all_legs.extend(plegs)
            pattern_groups.append(group)

    def node_df(var: str) -> DataFrame:
        label, props = var_specs[var]
        df = nodes
        if label is not None:
            df = df.filter(F.col("label") == label)
        for k, v in props.items():
            df = df.filter(F.col("props")[k] == v)
        return df.select(
            F.col("node_id").alias(f"{var}__id"),
            F.col("key").alias(f"{var}__key"),
            F.col("props").alias(f"{var}__props"),
        )

    # assemble: start with the first variable, fold in legs whose source or
    # target is already bound, then cross-join disjoint pattern groups
    bound: set[str] = set()
    plan: DataFrame | None = None

    def leg_df(leg) -> DataFrame:
        src, rel, dst = leg
        if src == dst:
            raise CypherUnsupported("self-loop legs are not supported")
        e = edges
        if rel is not None:
            e = e.filter(F.col("label") == rel)
        return e.select(
            F.col("src_id").alias(f"{src}__id"),
            F.col("dst_id").alias(f"{dst}__id"),
        )

    pending = list(enumerate(all_legs))
    # seed with the first pattern's first variable
    first_var = pattern_groups[0][0]
    plan = node_df(first_var)
    bound.add(first_var)
    progress = True
    while pending and progress:
        progress = False
        for item in list(pending):
            idx, (src, rel, dst) = item
            if src in bound or dst in bound:
                e = leg_df((src, rel, dst))
                join_keys = [
                    f"{v}__id" for v in (src, dst) if v in bound
                ]
                # rename the edge's columns for not-yet-bound endpoints
                plan = plan.join(e, on=join_keys)
                for v in (src, dst):
                    if v not in bound:
                        bound.add(v)
                        plan = plan.join(node_df(v), on=f"{v}__id")
                pending.remove(item)
                progress = True
    # disjoint groups (no shared vars / no connecting leg): cartesian
    for group in pattern_groups:
        for var in group:
            if var not in bound:
                plan = plan.crossJoin(node_df(var))
                bound.add(var)
    if pending:
        # legs between vars that only became bound via cross join
        for idx, (src, rel, dst) in pending:
            e = leg_df((src, rel, dst))
            plan = plan.join(e, on=[f"{src}__id", f"{dst}__id"])

    # ---- WHERE --------------------------------------------------------
    def prop_col(var: str, prop: str) -> Column:
        if var not in var_specs:
            raise CypherUnsupported(f"unknown variable {var!r}")
        return F.col(f"{var}__props")[prop]

    for where_text in clauses.get("WHERE", []):
        for cond_text in re.split(r"\bAND\b", where_text, flags=re.IGNORECASE):
            cond_text = cond_text.strip()
            if not cond_text:
                continue
            cm = _COND.fullmatch(cond_text)
            if cm is None:
                raise CypherUnsupported(f"unsupported condition {cond_text!r}")
            var, prop, op, lit = cm.groups()
            col = prop_col(var, prop)
            op = re.sub(r"\s+", " ", op.upper())
            if lit[0] in "'\"":
                val: Column | str = lit[1:-1]
            else:
                col = col.try_cast("double")
                val = F.lit(float(lit))
            expr = {
                "=": lambda: col == val,
                "<>": lambda: col != val,
                "<": lambda: col < val,
                "<=": lambda: col <= val,
                ">": lambda: col > val,
                ">=": lambda: col >= val,
                "CONTAINS": lambda: col.contains(val),
                "STARTS WITH": lambda: col.startswith(val),
                "ENDS WITH": lambda: col.endswith(val),
            }[op]()
            plan = plan.filter(expr)

    # ---- RETURN -------------------------------------------------------
    ret_text = " ".join(clauses["RETURN"])
    distinct = False
    if re.match(r"DISTINCT\b", ret_text, re.IGNORECASE):
        distinct = True
        ret_text = ret_text[len("DISTINCT"):].strip()
    keys: list[tuple[str, Column]] = []
    aggs: list[tuple[str, Column]] = []
    for item in _split_top_commas(ret_text):
        m = _RET_ITEM.fullmatch(item.strip())
        if m is None:
            raise CypherUnsupported(f"unsupported return item {item!r}")
        cnt, cnt_distinct, cnt_arg, var, prop, alias = m.groups()
        if cnt:
            arg = cnt_arg.strip()
            name = alias or f"count_{arg.replace('.', '_').replace('*', 'all')}"
            if arg == "*":
                c = F.count("*")
            else:
                v, _, p = arg.partition(".")
                target = prop_col(v, p) if p else F.col(f"{v}__key")
                c = (
                    F.countDistinct(target)
                    if cnt_distinct
                    else F.count(target)
                )
            aggs.append((name, c.cast("long")))
        else:
            name = alias or (f"{var}_{prop}" if prop else var)
            col = prop_col(var, prop) if prop else F.col(f"{var}__key")
            keys.append((name, col))

    if aggs:
        grouped = plan.groupBy(
            *[c.alias(n) for n, c in keys]
        ) if keys else plan.groupBy()
        out = grouped.agg(*[c.alias(n) for n, c in aggs])
    else:
        out = plan.select(*[c.alias(n) for n, c in keys])
        if distinct:
            out = out.dropDuplicates()

    # ---- ORDER BY / LIMIT --------------------------------------------
    for order_text in clauses.get("ORDER_BY", []):
        order_cols = []
        for part in _split_top_commas(order_text):
            om = re.fullmatch(
                r"(\w+)(?:\s+(ASC|DESC))?", part.strip(), re.IGNORECASE
            )
            if om is None or om.group(1) not in out.columns:
                raise CypherUnsupported(
                    f"ORDER BY must use a returned column name: {part!r}"
                )
            name, direction = om.groups()
            col = F.col(name)
            order_cols.append(
                col.desc() if (direction or "").upper() == "DESC" else col.asc()
            )
        out = out.orderBy(*order_cols)
    if "LIMIT" in clauses:
        out = out.limit(int(clauses["LIMIT"][0].strip()))
    return out
