"""robots.txt REP subset (sources/robots.py): parse + admission join."""

from kgforge.sources.robots import parse_robots, robots_filter

ROBOTS = """
# example
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp

User-agent: kgbot
User-agent: otherbot
Disallow: /only-for-kgbot/
Allow:    /only-for-kgbot/pub

User-agent: wildcards
Disallow: /a/*/b
Disallow: /end$
Disallow:
"""


def test_parse_robots_groups_and_subset():
    rules = parse_robots(ROBOTS)
    assert ("*", "disallow", "/private/") in rules
    assert ("*", "allow", "/private/ok") in rules
    # shared group: both agents get the block
    assert ("kgbot", "disallow", "/only-for-kgbot/") in rules
    assert ("otherbot", "allow", "/only-for-kgbot/pub") in rules
    # wildcard/$ rules and empty Disallow are dropped
    assert not [r for r in rules if r[0] == "wildcards"]


def test_robots_filter_precedence(spark):
    rules = spark.createDataFrame(
        [("ex.com", a, r, p) for a, r, p in parse_robots(ROBOTS)],
        "host string, agent string, rule string, path string",
    )
    urls = spark.createDataFrame(
        [
            ("https://ex.com/public/x",),        # no matching rule
            ("https://ex.com/private/secret",),  # disallow /private/
            ("https://ex.com/private/ok/doc",),  # longer allow wins
            ("https://ex.com/tmp",),             # exact prefix disallow
            ("https://other.com/private/x",),    # host without robots
            ("https://ex.com/only-for-kgbot/z",),  # '*' group for nonbot
        ],
        "url string",
    )
    got = {
        r.url: r.allowed
        for r in robots_filter(urls, rules, agent="NonBot").collect()
    }
    assert got == {
        "https://ex.com/public/x": True,
        "https://ex.com/private/secret": False,
        "https://ex.com/private/ok/doc": True,
        "https://ex.com/tmp": False,
        "https://other.com/private/x": True,
        # '*' group has no /only-for-kgbot rule
        "https://ex.com/only-for-kgbot/z": True,
    }

    # exact agent group SHADOWS '*' entirely (REP group selection)
    got_bot = {
        r.url: r.allowed
        for r in robots_filter(urls, rules, agent="KgBot").collect()
    }
    assert got_bot["https://ex.com/only-for-kgbot/z"] is False
    # kgbot's group has no /private rule and '*' no longer applies
    assert got_bot["https://ex.com/private/secret"] is True


def test_robots_filter_ties_and_duplicates(spark):
    rules = spark.createDataFrame(
        [
            ("h.io", "*", "allow", "/p"),
            ("h.io", "*", "disallow", "/p"),  # equal length: allow wins
        ],
        "host string, agent string, rule string, path string",
    )
    urls = spark.createDataFrame(
        [("http://h.io/p/1",), ("http://h.io/p/1",)], "url string"
    )
    out = robots_filter(urls, rules, agent="x").collect()
    assert len(out) == 2  # duplicate input rows both survive
    assert all(r.allowed for r in out)
