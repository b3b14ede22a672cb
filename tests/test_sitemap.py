"""sitemap.xml parsing unit tests: entry extraction, entity unescape,
optional children, the urlset/sitemapindex split, and the no-Python
plan pin (the parser must stay pure expressions — the driver gate's
DuckDB oracle replays the exact regexps)."""

from pyspark.sql import functions as F

from kgforge.sources.sitemap import parse_sitemaps


def _df(spark, xmls):
    return spark.createDataFrame(
        [(i, x) for i, x in enumerate(xmls)], "site long, xml string"
    )


def test_parse_urlset_fields_and_unescape(spark):
    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://x">\n'
        "<url><loc> https://e.com/a?x=1&amp;y=&lt;2&gt; </loc>"
        "<lastmod>2024-01-02</lastmod><priority>0.8</priority></url>\n"
        "<url><loc>https://e.com/b</loc><changefreq>daily</changefreq>"
        "</url></urlset>"
    )
    rows = sorted(
        parse_sitemaps(_df(spark, [xml]), "xml", ["site"]).collect(),
        key=lambda r: r.loc,
    )
    assert [
        (r.kind, r.loc, r.lastmod, r.changefreq, r.priority) for r in rows
    ] == [
        ("url", "https://e.com/a?x=1&y=<2>", "2024-01-02", None, "0.8"),
        ("url", "https://e.com/b", None, "daily", None),
    ]


def test_parse_sitemapindex_and_locless_dropped(spark):
    xml = (
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><lastmod>2024-02-02</lastmod></sitemap></sitemapindex>"
    )
    rows = parse_sitemaps(_df(spark, [xml])).collect()
    assert [(r.kind, r.loc, r.lastmod) for r in rows] == [
        ("sitemap", "https://e.com/s1.xml", "2024-02-01")
    ]


def test_parse_multiline_blocks(spark):
    xml = "<urlset><url>\n  <loc>\n   https://e.com/m\n  </loc>\n</url></urlset>"
    rows = parse_sitemaps(_df(spark, [xml])).collect()
    assert [(r.kind, r.loc) for r in rows] == [("url", "https://e.com/m")]


def test_parse_plan_is_pure_expressions(spark):
    plan = (
        parse_sitemaps(_df(spark, ["<urlset></urlset>"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan
