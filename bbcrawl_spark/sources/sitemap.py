"""Sitemap ingestion — the sitemaps.org protocol as a crawl-planning source.

The reference seeds crawls from explicit URL lists and pagers
(/root/reference/libcrawl/pagers.go; cmd-line ``-url``). At web scale the
two standard *discovered* planning inputs alongside that are the CDX URL
index (sources/cdx.py) and the site-published sitemap: robots.txt names
sitemap files (``Sitemap:`` directives, RFC 9309 §2.3 — allowed anywhere
in the file, case-insensitive, group-independent), each sitemap is either
a ``<urlset>`` of page URLs (optionally with ``<lastmod>`` freshness
hints the scheduler can prioritize on) or a ``<sitemapindex>`` naming
further sitemap shards. This module provides that discovery chain:

* :func:`sitemaps_from_robots` — ``Sitemap:`` directives out of fetched
  robots.txt bodies.
* :func:`read_sitemaps` — sitemap files (plain or ``.gz``) one-per-row.
* :func:`parse_sitemaps` — urlset/sitemapindex XML -> (kind, loc,
  lastmod) rows.

Parsing is flat JVM regex + split — deliberately no XML library: the
sitemaps.org schema is a flat fixed-element format (``<url>``/
``<sitemap>`` blocks with ``<loc>``/``<lastmod>`` children), the regex
path keeps the whole operator inside whole-stage codegen with zero Python,
and the patterns live in the Java-regex ∩ RE2 dialect so the DuckDB
oracle replays them verbatim. Malformed blocks degrade per-block (no
``<loc>`` -> row dropped; no ``<lastmod>`` -> NULL), never per-file.

Scale shape: sitemaps.org caps one file at 50k URLs / 50 MB uncompressed,
so one-file-per-row is bounded by protocol; a 10^6-sitemap corpus
parallelizes at file granularity through the text source, and the parse
is a flatMap (explode) with no exchange at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "SITEMAP_DIRECTIVE_PATTERN",
    "LOC_PATTERN",
    "LASTMOD_PATTERN",
    "sitemaps_from_robots",
    "read_sitemaps",
    "parse_sitemaps",
]

#: ``Sitemap:`` directive — case-insensitive, leading whitespace allowed,
#: value = first non-space run (sitemap URLs cannot contain spaces).
#: Java-regex ∩ RE2 so the DuckDB oracle replays the identical string.
SITEMAP_DIRECTIVE_PATTERN = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"

#: block-child extractors; non-greedy body with explicit whitespace trim
#: (``<loc> url </loc>`` is legal and must yield the bare url)
LOC_PATTERN = r"<loc>\s*([^<]*?)\s*</loc>"
LASTMOD_PATTERN = r"<lastmod>\s*([^<]*?)\s*</lastmod>"


def sitemaps_from_robots(
    df: DataFrame,
    robots_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt bodies.

    One output row per directive occurrence: (``host_col``,
    ``sitemap_url``). Hosts whose robots.txt names no sitemap produce no
    row (explode drops empty matches); duplicate directives are kept —
    the consumer unions these with its sitemap frontier and dedups there
    (the seen-set's job, not this extractor's).
    """
    urls = F.regexp_extract_all(
        F.col(robots_col), F.lit(SITEMAP_DIRECTIVE_PATTERN), 1
    )
    return df.select(F.col(host_col), F.explode(urls).alias("sitemap_url"))


def read_sitemaps(spark: SparkSession, paths) -> DataFrame:
    """Sitemap files -> one row per file: (``sitemap_path``, ``xml``).

    Rides ``spark.read.text(wholetext=True)`` — ``.gz`` files decompress
    by codec extension, parallelism is per-file, and the protocol's 50 MB
    uncompressed cap bounds per-row memory. Pair with
    :func:`parse_sitemaps`.
    """
    df = spark.read.text(paths, wholetext=True)
    return df.select(
        F.input_file_name().alias("sitemap_path"), F.col("value").alias("xml")
    )


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "xml",
    src_col: str | None = None,
) -> DataFrame:
    """Parse sitemap XML into one row per entry.

    Returns (``src_col``?, ``kind``, ``loc``, ``lastmod``): kind is
    ``'sitemap'`` for ``<sitemapindex>`` files (loc = a child sitemap to
    fetch next — the recursion is the caller's loop, like the crawl
    rounds) and ``'url'`` for ``<urlset>`` files (loc = a page URL for
    the frontier). ``lastmod`` is the raw string (NULL when absent) —
    scheduling logic decides how to parse/compare freshness.

    Plan: split on the closing block tags -> explode -> two
    regexp_extracts; zero exchanges, zero Python, blocks never leave
    their file's partition.
    """
    xml = F.col(xml_col)
    kind = (
        F.when(F.instr(xml, "<sitemapindex") > 0, F.lit("sitemap"))
        .otherwise(F.lit("url"))
    )
    lead = [F.col(src_col)] if src_col else []
    blocks = df.select(
        *lead,
        kind.alias("kind"),
        F.explode(F.split(xml, "</url>|</sitemap>")).alias("_blk"),
    )
    loc = F.regexp_extract("_blk", LOC_PATTERN, 1)
    lastmod = F.regexp_extract("_blk", LASTMOD_PATTERN, 1)
    out_lead = [src_col] if src_col else []
    return (
        blocks.select(
            *out_lead,
            "kind",
            loc.alias("loc"),
            F.nullif(lastmod, F.lit("")).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )
