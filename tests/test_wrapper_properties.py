"""Property-based robustness for round-2 surfaces.

- UFC wrapper: synthesize a page from the sports-statistics template with
  hypothesis-generated values (accents, apostrophes, hyphens, extreme
  stats) and require exact recovery — the inverse-render property a
  wrapper must satisfy on its template family.
- Cypher executor: single-leg MATCH must agree with the independently
  implemented match_edges operator on random small graphs.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.operators.wrappers import UfcFightStats

_NAME_CHARS = string.ascii_letters + "áéíóúãâôçüñ'- "


def _name():
    return st.text(
        alphabet=_NAME_CHARS, min_size=3, max_size=24
    ).map(lambda s: " ".join(("X" + s).split())).filter(
        lambda s: 3 <= len(s) <= 26 and "(" not in s and s == s.strip()
    )


_TEMPLATE = """<html><head><title>{fight} Fight Statistics</title></head>
<body>
<div class="header-breadcrumb"><ol>
<li><a href="/"><span itemprop="name">Home</span></a> &gt;</li>
<li><a href="/u/"><span itemprop="name">UFC Fight Statistics</span></a> &gt;</li>
<li><a href="/u/e/"><span itemprop="name">{event}</span></a> &gt;</li>
</ol></div>
<h1 class="white">{fight} Fight Statistics</h1>
<div class="row fight_meta"><p>
	 	{date_txt}, {location}	 </p></div>
<div class="toprow fighter_row_top_ufc">
<div class="topcolumn">
	{f1}	 ({o1})<br/>
</div>
<div class="topcolumn">
	{f2}	 ({o2})<br/>
	"{nick2}"
</div>
</div>
<div class="row fight_summary_ufc"><div>
<h2>Bout</h2>
<ul>
<li><b>Method</b>: {method} </li>
<li><b>Round</b>: {rounds} </li>
<li><b>Time</b>: 3:14 </li>
<li><b>Referee</b>: {referee} </li>
<li><b>Details</b>: {details} </li>
</ul></div></div>
<div class="row fight_data_ufc"><div class="totals_summary">
<h2>Fight Totals</h2>
<table><thead><tr>
<th scope="col">{f1}</th> <th scope="col"></th> <th scope="col">{f2}</th>
</tr></thead><tbody>
<tr><td>{kd1}</td><th scope="row">Knockdowns</th><td>{kd2}</td><tr>
<tr><td>{ss1} of {ssa1}</td><th scope="row">Significant Strikes</th><td>{ss2} of {ssa2}</td><tr>
<tr><td>{ssa1}</td><th scope="row">Significant Strikes Attempted</th><td>{ssa2}</td><tr>
</tbody></table>
</div>
<div class="totals_by_round"><h3>Fight Totals By Round</h3>
<h4>Round 1</h4><table><tbody>
<tr><td>9</td><th scope="row">Knockdowns</th><td>9</td><tr>
</tbody></table></div>
</div></body></html>"""


@settings(max_examples=60, deadline=None)
@given(
    f1=_name(), f2=_name(), nick2=_name(),
    event=_name(), location=_name(),
    referee=_name(),
    method=st.sampled_from(
        ["KO/TKO", "Submission", "Decision - Unanimous", "DQ",
         "TKO - Doctor's Stoppage"]
    ),
    rounds=st.integers(1, 5),
    o1=st.sampled_from(["Win", "Loss", "Draw"]),
    kd=st.tuples(st.integers(0, 9), st.integers(0, 9)),
    ss=st.tuples(st.integers(0, 400), st.integers(0, 400)),
)
def test_ufc_wrapper_inverse_render(
    f1, f2, nick2, event, location, referee, method, rounds, o1, kd, ss
):
    if f1 == f2:
        return
    o2 = "Loss" if o1 == "Win" else "Win"
    html = _TEMPLATE.format(
        fight=f"{f1} v {f2}", event=event, date_txt="March 7, 2024",
        location=location, f1=f1, f2=f2, o1=o1, o2=o2, nick2=nick2,
        method=method, rounds=rounds, referee=referee, details="Det",
        kd1=kd[0], kd2=kd[1], ss1=ss[0], ssa1=ss[0] + 5,
        ss2=ss[1], ssa2=ss[1] + 5,
    )
    w = UfcFightStats()
    assert w.matches(html)
    ents, rels = w.extract(html)
    by = {(l, k): a for l, k, a in ents}
    fight = f"{f1} v {f2}"
    assert by[("Event", event)]["date"] == "2024-03-07"
    assert by[("Event", event)]["location"] == location
    assert by[("Fight", fight)]["method"] == method
    assert by[("Fight", fight)]["rounds"] == str(rounds)
    assert by[("Fight", fight)]["referee"] == referee
    assert by[("Fighter", f1)]["outcome"] == o1
    assert by[("Fighter", f2)]["nickname"] == nick2
    assert by[("FightStatistics", f1)]["knockdowns"] == str(kd[0])
    assert by[("FightStatistics", f2)]["significant_strikes"] == str(ss[1])
    # by-round tables must NOT leak into the totals (9/9 sentinel)
    assert by[("FightStatistics", f1)]["knockdowns"] != "9" or kd[0] == 9
    assert len(rels) == 7


def test_cypher_single_leg_agrees_with_match_edges(spark):
    """Independent implementations must agree: run_cypher's single-leg
    MATCH vs graph_query.match_edges on a seeded random graph."""
    import random

    from pyspark.sql import functions as F

    from kgforge.plans.cypher_exec import run_cypher
    from kgforge.plans.graph_query import match_edges

    rng = random.Random(17)
    labels = ["A", "B", "C"]
    nodes = spark.createDataFrame(
        [(i, rng.choice(labels), f"n{i}", {}) for i in range(60)],
        "node_id bigint, label string, key string, props map<string,string>",
    ).cache()
    rels = ["R", "S"]
    edges = spark.createDataFrame(
        [
            (rng.randrange(60), rng.choice(rels), rng.randrange(60), {})
            for _ in range(200)
        ],
        "src_id bigint, label string, dst_id bigint, props map<string,string>",
    ).dropDuplicates(["src_id", "label", "dst_id"]).cache()

    for src_l, rel_l, dst_l in [
        ("A", "R", "B"), ("B", "S", "C"), ("C", "R", "A"), ("A", "S", "A"),
    ]:
        via_cypher = {
            (r.a, r.b)
            for r in run_cypher(
                f"MATCH (a:{src_l})-[:{rel_l}]->(b:{dst_l}) RETURN a, b",
                nodes, edges,
            ).collect()
        }
        via_match = {
            (r.src_key, r.dst_key)
            for r in match_edges(nodes, edges, src_l, rel_l, dst_l).collect()
        }
        assert via_cypher == via_match, (src_l, rel_l, dst_l)
