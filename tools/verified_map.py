"""Regenerate the driver-verification rotation map (verdict r04 #1).

Reads every CORRECTNESS_r*.json at the repo root, computes per gate the
latest round with a green driver row (oracle gates: rows/schema/hash all
match; declared rows-only gates: the rows check ran without error), and
prints (a) the `_VERIFIED_ROUND` literal for kgforge/driver_queries.py and
(b) VERIFIED.md. Run after each round's artifact lands:

    python tools/verified_map.py            # print both to stdout
    python tools/verified_map.py --write    # rewrite VERIFIED.md in place
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green(row: dict) -> bool:
    return (
        row.get("err") in (None, "no_oracle")
        and row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


def latest_green() -> dict[str, int]:
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rows = json.load(f)
        for gate, row in rows.items():
            if green(row):
                seen[gate] = max(seen.get(gate, 0), rnd)
    return seen


def main() -> None:
    sys.path.insert(0, ROOT)
    from kgforge import driver_queries as dq

    reg = list(dq.QUERIES)
    seen = latest_green()
    order = sorted(reg, key=lambda n: (seen.get(n, 0), reg.index(n)))

    literal = ["_VERIFIED_ROUND: dict[str, int] = {"]
    literal += [f'    "{n}": {seen[n]},' for n in reg if n in seen]
    literal.append("}")

    md = [
        "# VERIFIED — gate → latest green driver round",
        "",
        "Map of every `queries()` gate to the latest round whose driver",
        "CORRECTNESS artifact carries a green row for it (`-` = not yet in",
        "any artifact; the driver records 50 rows/round). `queries()` emits",
        "gates in the order below — never-verified first, then",
        "stalest-first — so the next artifact drains the backlog first.",
        "Regenerate with `python tools/verified_map.py --write`.",
        "",
        "| # | gate | oracle | last green round |",
        "|---|------|--------|------------------|",
    ]
    for i, n in enumerate(order, 1):
        md.append(
            f"| {i} | {n} | {'O' if n in dq.ORACLES else 'rows-only'} "
            f"| {seen.get(n, '-')} |"
        )
    md.append("")
    never = [n for n in reg if n not in seen]
    md.append(
        f"Totals: {len(reg)} gates, {len(dq.ORACLES)} with oracles, "
        f"{len(never)} never driver-verified (emitted first)."
    )
    md.append("")

    if "--write" in sys.argv:
        with open(os.path.join(ROOT, "VERIFIED.md"), "w") as f:
            f.write("\n".join(md))
        print(f"wrote VERIFIED.md ({len(order)} gates, {len(never)} never)")
    else:
        print("\n".join(literal))
        print()
        print("\n".join(md))


if __name__ == "__main__":
    main()
