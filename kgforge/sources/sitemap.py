"""sitemap.xml parsing — the crawl-frontier counterpart of robots.py.

A crawl pipeline discovers URLs from sitemaps (sitemaps.org protocol):
``<urlset>`` documents list page URLs with optional ``<lastmod>`` /
``<changefreq>`` / ``<priority>``, and ``<sitemapindex>`` documents list
child sitemaps. At ingest scale this is a column transform over millions
of fetched XML bodies — one row per sitemap file in, one row per
``<url>``/``<sitemap>`` entry out — so the parser is pure Spark
expressions (``regexp_extract_all`` + ``explode``), never a per-row XML
library: one WholeStageCodegen pass, no Python, no shuffle beyond the
explode.

Subset honestly supported: well-formed entry blocks (``<url>…</url>``,
``<sitemap>…</sitemap>``) with simple-text children; namespace prefixes
and attributes on ``<urlset>`` are ignored (they sit outside the entry
blocks); CDATA sections are out of subset (rare in practice — the
protocol says entity-escape). The five predefined XML entities are
unescaped in ``loc``. All regexps are RE2-portable (``[\\s\\S]*?``
instead of dotall flags), so the DuckDB driver oracle replays the exact
same patterns — the functions/scrub.py portability rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"<url>([\s\S]*?)</url>"
_MAP_BLOCK = r"<sitemap>([\s\S]*?)</sitemap>"
_CHILD = r"<{tag}>\s*([\s\S]*?)\s*</{tag}>"

# unescape order matters: &amp; LAST, or '&amp;lt;' would double-decode
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def _unescape(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _child(block: Column, tag: str) -> Column:
    got = F.regexp_extract(block, _CHILD.format(tag=tag), 1)
    return F.when(got != "", got)


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", id_cols: list[str] | None = None
) -> DataFrame:
    """One row per sitemap entry: (*id_cols, kind, loc, lastmod,
    changefreq, priority).

    ``kind`` is 'url' for ``<urlset>`` page entries and 'sitemap' for
    ``<sitemapindex>`` child-sitemap entries (an index's children carry
    only loc/lastmod; the page-only fields come back NULL, as do any
    absent optional children). ``loc`` is entity-unescaped;
    ``priority`` stays a STRING — a exactness-preserving raw field the
    caller casts (the repo's float rule: no silent float parse inside
    the operator)."""
    ids = list(id_cols or [])
    legs = []
    for kind, pat in (("url", _URL_BLOCK), ("sitemap", _MAP_BLOCK)):
        legs.append(
            df.select(
                *ids,
                F.lit(kind).alias("kind"),
                F.explode(
                    F.regexp_extract_all(F.col(xml_col), F.lit(pat), F.lit(1))
                ).alias("__block"),
            )
        )
    blocks = legs[0].unionByName(legs[1])
    return blocks.select(
        *ids,
        "kind",
        _unescape(_child(F.col("__block"), "loc")).alias("loc"),
        _child(F.col("__block"), "lastmod").alias("lastmod"),
        _child(F.col("__block"), "changefreq").alias("changefreq"),
        _child(F.col("__block"), "priority").alias("priority"),
    ).where(F.col("loc").isNotNull())
