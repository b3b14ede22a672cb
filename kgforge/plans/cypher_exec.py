"""Cypher-subset executor: compile read queries to DataFrame join plans.

The reference's query path LLM-generates Cypher and ships it to FalkorDB
(ref graphrag_sdk/steps/graph_query_step.py:40-82; the prompt documents the
expected query surface, fixtures/prompts.py:366-406). A reference user
switching engines brings STORED Cypher queries; this module executes the
read subset those prompts actually produce, against the materialized
`nodes(node_id, label, key, props)` / `edges(src_id, label, dst_id, props)`
tables:

    MATCH (a:L1)-[:R1]->(b:L2)<-[:R2]-(c), (d:L3) ...
    MATCH (a:L1)-[:R1*1..3]->(b:L2)                  -- variable length
    MATCH p = shortestPath((a:L1)-[:R1*..6]->(b:L2)) -- RETURN length(p)
    WHERE a.prop = 'x' AND b.n >= 3 AND c.name CONTAINS 'y'
    RETURN a, b.prop AS p, count(c) AS n  [DISTINCT]
    ORDER BY n DESC, p LIMIT 10

Semantics and scope:

- patterns are chains of directed legs; comma-separated patterns join on
  shared variables (cartesian when disjoint, as in Cypher). Undirected
  legs raise (direction carries meaning in the property graph).
- variable-length legs ``-[:R*m..n]->`` compile to bounded iterative
  frontier expansion (the bfs_distances shape from plans/graph_query:
  per-level equi-join + dropDuplicates + localCheckpoint, early exit on a
  drained frontier) producing an (src, dst) reachability-pair relation
  that joins into the plan like any other leg. For ``m <= 1`` this is
  exact Cypher semantics; for ``m >= 2`` pairs are matched per WALK length
  (Cypher's per-path relationship-uniqueness is not enforced — exact on
  acyclic graphs, a superset on cyclic ones; documented, like FalkorDB's
  own deviation notes). Unbounded ``*`` is capped at `max_hops`.
- ``p = shortestPath((a)-[:R*..n]->(b))`` binds ``p`` to the min-hop
  distance between each (a, b) pair within n hops; ``length(p)`` returns
  it. Exact (BFS levels ARE min distances).
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
_EDGE = re.compile(
    r"(<-|-)\s*\[\s*(\w+)?\s*(?::\s*(\w+))?\s*"
    r"(\*\s*(\d+)?\s*(?:(\.\.)\s*(\d+)?)?)?\s*\]\s*(->|-)"
)
_SHORTEST = re.compile(
    r"^(\w+)\s*=\s*(?:all)?shortestPath\s*\(\s*(.+)\s*\)$",
    re.IGNORECASE | re.DOTALL,
)
MAX_VAR_HOPS = 8  # bound for unbounded * / shortestPath expansion
_COND = re.compile(
    r"(\w+)\.(\w+)\s*(=|<>|<=|>=|<|>|CONTAINS|STARTS\s+WITH|ENDS\s+WITH)"
    r"\s*('(?:[^']*)'|\"(?:[^\"]*)\"|-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)
_RET_ITEM = re.compile(
    r"^(?:(count)\s*\(\s*(DISTINCT\s+)?(\*|\w+(?:\.\w+)?)\s*\)"
    r"|(length)\s*\(\s*(\w+)\s*\)"
    r"|(\w+)(?:\.(\w+))?)"
    r"(?:\s+AS\s+(\w+))?$",
    re.IGNORECASE,
)


def _mask_quotes(s: str) -> str:
    """Same-length copy with quoted-span CONTENTS replaced by 'x', so
    keyword scans (clause split, AND split) can't match inside string
    literals (ADVICE r02: MATCH ... WHERE m.title = 'The Return' parsed
    RETURN out of the literal). Positions map 1:1 back to the original."""
    out, quote = [], None
    for ch in s:
        if quote is not None:
            if ch == quote:
                quote = None
                out.append(ch)
            else:
                out.append("x")
        elif ch in "'\"":
            quote = ch
            out.append(ch)
        else:
            out.append(ch)
    return "".join(out)


def _split_keyword(s: str, pattern: str) -> list[str]:
    """Split `s` on a keyword regex, ignoring matches inside quotes."""
    masked = _mask_quotes(s)
    parts, last = [], 0
    for m in re.finditer(pattern, masked, flags=re.IGNORECASE):
        parts.append(s[last: m.start()])
        last = m.end()
    parts.append(s[last:])
    return parts


class CypherUnsupported(ValueError):
    """Query uses syntax outside the executed subset."""


def _split_clauses(cypher: str) -> dict:
    text = cypher.strip().rstrip(";")
    parts = []
    last = 0
    for m in _CLAUSE.finditer(_mask_quotes(text)):
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


def _parse_pattern(pattern: str, var_gen, max_hops: int = MAX_VAR_HOPS):
    """One comma-free pattern -> (node specs, leg list).

    node spec: var -> (label|None, inline props dict)
    leg: (src_var, rel_label|None, dst_var, hops) — hops is None for a
    plain single-hop leg, else the (min, max) of a `*m..n` quantifier.
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
        left, _rel_var, rel_label, quant, qmin, qdots, qmax, right = em.groups()
        pos = em.end()
        nm = _NODE.match(pattern, pos)
        if nm is None:
            raise CypherUnsupported(f"expected node at: {pattern[pos:]!r}")
        cur = node_of(nm)
        nodes.append(cur)
        pos = nm.end()
        hops = None
        if quant is not None:
            lo = int(qmin) if qmin else 1
            if qdots:  # *m..n / *..n / *m.. / *..
                hi = int(qmax) if qmax else max_hops
            else:  # * / *m  (bare *m is exactly-m in Cypher)
                hi = int(qmin) if qmin else max_hops
            if lo < 1 or hi < lo:
                raise CypherUnsupported(f"bad quantifier in {pattern!r}")
            hops = (lo, hi)
        if left == "-" and right == "->":
            legs.append((prev[0], rel_label, cur[0], hops))
        elif left == "<-" and right == "-":
            legs.append((cur[0], rel_label, prev[0], hops))
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


def run_cypher(
    cypher: str,
    nodes: DataFrame,
    edges: DataFrame,
    max_hops: int = MAX_VAR_HOPS,
) -> DataFrame:
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
    path_vars: dict[str, tuple] = {}  # path var -> its shortestPath leg
    pattern_groups: list[list[str]] = []  # vars per comma-pattern
    for match_text in clauses["MATCH"]:
        for pat in _split_top_commas(match_text):
            path_var = None
            sm = _SHORTEST.match(pat)
            if sm is not None:
                path_var, pat = sm.group(1), sm.group(2)
            pnodes, plegs = _parse_pattern(pat, var_gen, max_hops)
            if path_var is not None:
                if len(plegs) != 1 or plegs[0][3] is None:
                    raise CypherUnsupported(
                        "shortestPath takes one variable-length leg"
                    )
                path_vars[path_var] = plegs[0]
            group = []
            for var, label, props in pnodes:
                if var in var_specs:
                    old_label, old_props = var_specs[var]
                    label = label or old_label
                    props = {**old_props, **props}
                var_specs[var] = (label, props)
                group.append(var)
            all_legs.extend(
                [leg + (None,) for leg in plegs] if path_var is None
                else [plegs[0] + (path_var,)]
            )
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

    def _rel_edges(rel) -> DataFrame:
        e = edges
        if rel is not None:
            e = e.filter(F.col("label") == rel)
        return e.select("src_id", "dst_id")

    def _seeded(e: DataFrame, src: str) -> DataFrame:
        """Prune the expansion's origin set by the src var's node filter
        (label / inline props) — the pushdown that keeps a bounded
        traversal from exploring the whole graph when the query anchors
        it ('from this Customer, 2 hops out')."""
        label, props = var_specs[src]
        if label is None and not props:
            return e
        seed = node_df(src).select(F.col(f"{src}__id").alias("src_id"))
        return e.join(seed, on="src_id", how="left_semi")

    def _var_pairs(leg) -> DataFrame:
        """(src__id, dst__id) pairs connected by a walk of length in
        [lo, hi]; plus <path>__len = min hops for shortestPath legs.
        Level-wise frontier joins, deduped + localCheckpoint per level,
        early exit when the frontier drains (graph_query.bfs_distances
        iterative hygiene)."""
        src, rel, dst, (lo, hi), path_var = leg
        e = _rel_edges(rel).dropDuplicates()
        track_min = path_var is not None
        # origin pruning applies to the FIRST frontier only — later hops
        # pass through nodes of any label
        frontier = _seeded(e, src).select(
            "src_id", "dst_id", F.lit(1).cast("long").alias("_d")
        ).localCheckpoint()
        result = frontier if (track_min or lo <= 1) else None
        for depth in range(2, hi + 1):
            step = (
                frontier.select("src_id", F.col("dst_id").alias("_mid"), "_d")
                .join(
                    e.select(
                        F.col("src_id").alias("_mid"),
                        F.col("dst_id").alias("dst_id"),
                    ),
                    on="_mid",
                )
                .select("src_id", "dst_id", (F.col("_d") + 1).alias("_d"))
                .dropDuplicates(["src_id", "dst_id"])
            )
            if track_min:
                # min-dist BFS: never revisit a settled pair
                step = step.join(
                    result.select("src_id", "dst_id"),
                    on=["src_id", "dst_id"],
                    how="left_anti",
                )
            step = step.localCheckpoint()
            if step.isEmpty():
                break
            frontier = step
            if track_min or depth >= lo:
                result = step if result is None else result.unionByName(step)
        if result is None:
            result = frontier.limit(0)
        if track_min:
            out = result.filter(F.col("_d") >= lo).select(
                F.col("src_id").alias(f"{src}__id"),
                F.col("dst_id").alias(f"{dst}__id"),
                F.col("_d").alias(f"{path_var}__len"),
            )
        else:
            out = result.filter(F.col("_d") >= lo).select(
                F.col("src_id").alias(f"{src}__id"),
                F.col("dst_id").alias(f"{dst}__id"),
            ).dropDuplicates()
        return out

    def leg_df(leg) -> DataFrame:
        src, rel, dst, hops, path_var = leg
        if src == dst:
            raise CypherUnsupported("self-loop legs are not supported")
        if hops is not None:
            return _var_pairs(leg)
        return _rel_edges(rel).select(
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
            idx, leg = item
            src, dst = leg[0], leg[2]
            if src in bound or dst in bound:
                e = leg_df(leg)
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
        for idx, leg in pending:
            src, dst = leg[0], leg[2]
            e = leg_df(leg)
            plan = plan.join(e, on=[f"{src}__id", f"{dst}__id"])

    # ---- WHERE --------------------------------------------------------
    def prop_col(var: str, prop: str) -> Column:
        if var not in var_specs:
            raise CypherUnsupported(f"unknown variable {var!r}")
        return F.col(f"{var}__props")[prop]

    for where_text in clauses.get("WHERE", []):
        for cond_text in _split_keyword(where_text, r"\bAND\b"):
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
        cnt, cnt_distinct, cnt_arg, length_fn, length_arg, var, prop, alias = (
            m.groups()
        )
        if length_fn:
            if length_arg not in path_vars:
                raise CypherUnsupported(
                    f"length() takes a shortestPath variable, got {length_arg!r}"
                )
            name = alias or f"length_{length_arg}"
            keys.append((name, F.col(f"{length_arg}__len")))
        elif cnt:
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
