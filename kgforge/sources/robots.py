"""robots.txt parsing + URL admission filtering (REP core subset).

A crawl-derived corpus is only usable if ingestion can prove it honored
the Robots Exclusion Protocol; at pipeline scale that is a JOIN problem
— millions of URLs against per-host rule sets — not a per-URL library
call. Two pieces:

- `parse_robots`: robots.txt text -> (agent, rule, path) rows. Pure
  Python (runs driver-side on small config corpora, or inside
  mapInPandas per host file at crawl scale).
- `robots_filter`: admit/deny a URL column against a broadcast rule
  table with REP precedence — the most specific matching user-agent
  group wins (exact match beats ``*``), within the group the LONGEST
  matching path prefix wins, and on equal length Allow beats Disallow
  (Google's documented tie rule). No matching rule -> allowed.

Subset honestly supported: literal path prefixes (no ``*`` wildcards or
``$`` anchors inside paths — rules containing them are dropped by the
parser with a flag), case-sensitive paths, one agent token per rule
group line. That covers the overwhelming majority of real robots.txt
bodies; wildcard rules belong to a regex engine, not a prefix join.

Shape: urls x rules is a broadcast equi-join on host + a prefix Filter
+ one window top-1 per (url, agent-specificity) — rule tables are tiny
next to the URL corpus, so the scan side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(text: str) -> list[tuple[str, str, str]]:
    """robots.txt body -> [(agent_lower, 'allow'|'disallow', path)].

    Group semantics per REP: consecutive User-agent lines share the
    following rule block; blank lines end a group. Unsupported path
    patterns (embedded ``*`` or ``$``) and empty Disallow lines (which
    mean allow-all, i.e. no rule) are skipped. Comments (#) stripped.
    """
    out: list[tuple[str, str, str]] = []
    agents: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            agents, in_rules = ([], False) if in_rules else (agents, in_rules)
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                agents = []
                in_rules = False
            if val:
                agents.append(val.lower())
            continue
        if key in ("allow", "disallow"):
            in_rules = True
            if not val and key == "disallow":
                continue  # empty Disallow = allow all = no rule
            if "*" in val or "$" in val:
                continue  # wildcard subset not supported; drop loudly
            for a in agents:
                out.append((a, key, val))
    return out


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """urls + (host, agent, rule, path) rules -> urls with an
    ``allowed`` boolean (REP precedence, see module docstring).

    The rule group is chosen per host: rows whose agent exactly equals
    ``agent`` (lowercased) if any exist for that host, else the ``*``
    rows. Decision = longest matching path prefix, Allow wins length
    ties; hosts with no applicable rule (or URLs whose host has no
    robots entry) are allowed."""
    agent = agent.lower()
    u = urls.withColumn(
        # unique row tag: duplicate URL strings must each keep their row
        "__uid", F.monotonically_increasing_id()
    ).withColumn(
        "__host", F.lower(F.regexp_extract(F.col(url_col),
                                           r"^[a-z][a-z0-9+.-]*://([^/?#]+)",
                                           1)),
    ).withColumn(
        "__path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col),
                                 r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    r = rules.select(
        F.lower(F.col("host")).alias("__host"),
        F.lower(F.col("agent")).alias("__agent"),
        F.lower(F.col("rule")).alias("__rule"),
        F.col("path").alias("__rpath"),
    ).where(F.col("__agent").isin(agent, "*"))
    # agent specificity per host: exact group present -> '*' rows drop
    has_exact = (
        r.where(F.col("__agent") == agent)
        .select("__host").dropDuplicates()
        .withColumn("__exact", F.lit(True))
    )
    r = (
        r.join(has_exact, on="__host", how="left")
        .where(
            (F.col("__agent") == agent)
            | F.col("__exact").isNull()
        )
        .drop("__exact")
    )
    # prefix match INSIDE the left join: a URL whose host has rules but
    # none matching must survive as a no-rule (allowed) row
    j = u.join(
        F.broadcast(r),
        on=(u["__host"] == r["__host"])
        & u["__path"].startswith(r["__rpath"]),
        how="left",
    ).drop(r["__host"])
    w = Window.partitionBy("__uid").orderBy(
        F.length("__rpath").desc(),
        # equal length: allow sorts before disallow
        F.col("__rule").asc(),
    )
    best = (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .withColumn(
            "allowed",
            F.col("__rule").isNull() | (F.col("__rule") == "allow"),
        )
    )
    return best.select(*urls.columns, "allowed")
