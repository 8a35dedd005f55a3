"""Sitemap source (sources/sitemap.py): robots Sitemap: directives,
urlset/sitemapindex parsing, file reader (plain + gzip)."""

from __future__ import annotations

import gzip
import os

from bbcrawl_spark.sources import sitemap


def test_sitemaps_from_robots_directives(spark):
    rows = [
        # mid-file, canonical case
        ("a.example.com",
         "User-agent: *\nDisallow: /private\n"
         "Sitemap: http://a.example.com/sitemap.xml\nAllow: /\n"),
        # case-insensitive + leading whitespace + two directives
        ("b.example.com",
         "  sItEmAp:   http://b.example.com/sm1.xml\n"
         "User-agent: x\nSITEMAP: http://b.example.com/sm2.xml.gz\n"),
        # no directive -> no row
        ("c.example.com", "User-agent: *\nDisallow: /\n"),
        # 'sitemap:' must start the line — not a substring hit
        ("d.example.com", "Disallow: /not-a-sitemap: http://nope/\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = sorted(
        (r.host, r.sitemap_url)
        for r in sitemap.sitemaps_from_robots(df).collect()
    )
    assert got == [
        ("a.example.com", "http://a.example.com/sitemap.xml"),
        ("b.example.com", "http://b.example.com/sm1.xml"),
        ("b.example.com", "http://b.example.com/sm2.xml.gz"),
    ]


def test_parse_urlset_with_and_without_lastmod(spark):
    xml = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> http://h.example.com/a </loc>"
        "<lastmod>2024-01-05</lastmod></url>"
        "<url><loc>http://h.example.com/b</loc></url>"
        "<url><lastmod>2024-01-06</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "sid long, xml string")
    got = sorted(
        (r.sid, r.kind, r.loc, r.lastmod)
        for r in sitemap.parse_sitemaps(df, src_col="sid").collect()
    )
    assert got == [
        (1, "url", "http://h.example.com/a", "2024-01-05"),
        (1, "url", "http://h.example.com/b", None),
    ]


def test_parse_sitemapindex_kind(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://h.example.com/sm0.xml.gz</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc>http://h.example.com/sm1.xml.gz</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    got = sorted(
        (r.kind, r.loc, r.lastmod)
        for r in sitemap.parse_sitemaps(df).collect()
    )
    assert got == [
        ("sitemap", "http://h.example.com/sm0.xml.gz", "2024-02-01"),
        ("sitemap", "http://h.example.com/sm1.xml.gz", None),
    ]


def test_read_sitemaps_plain_and_gzip(spark, tmp_path):
    xml = (
        "<urlset><url><loc>http://x.example.com/1</loc></url>"
        "<url><loc>http://x.example.com/2</loc></url></urlset>"
    )
    plain = tmp_path / "a.xml"
    plain.write_text(xml)
    with gzip.open(tmp_path / "b.xml.gz", "wt") as fh:
        fh.write(xml.replace("x.example.com", "y.example.com"))
    df = sitemap.read_sitemaps(spark, str(tmp_path))
    parsed = sitemap.parse_sitemaps(df, src_col="sitemap_path")
    got = sorted(
        (os.path.basename(r.sitemap_path), r.loc) for r in parsed.collect()
    )
    assert got == [
        ("a.xml", "http://x.example.com/1"),
        ("a.xml", "http://x.example.com/2"),
        ("b.xml.gz", "http://y.example.com/1"),
        ("b.xml.gz", "http://y.example.com/2"),
    ]


def test_parse_is_jvm_only_no_exchange(spark):
    df = spark.createDataFrame([("<urlset></urlset>",)], "xml string")
    plan = (
        sitemap.parse_sitemaps(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_sitemap_urls_feed_the_crawl_frontier(spark):
    """Integration: the discovery chain ends in the scheduler — parsed
    sitemap URLs union into a frontier, dedup against the seen set, and
    politeness-rank per host like any other candidate batch."""
    from pyspark.sql import functions as F

    from bbcrawl_spark.functions import udfs
    from bbcrawl_spark.operators import dedup, politeness

    xml_a = (
        "<urlset>"
        + "".join(
            f"<url><loc>http://a.example.com/p{i}</loc></url>" for i in range(6)
        )
        + "</urlset>"
    )
    xml_b = (
        "<urlset>"
        + "".join(
            f"<url><loc>http://b.example.com/p{i}</loc></url>" for i in range(3)
        )
        + "</urlset>"
    )
    sm = spark.createDataFrame([(xml_a,), (xml_b,)], "xml string")
    cand = (
        sitemap.parse_sitemaps(sm)
        .filter(F.col("kind") == "url")
        .select(
            F.col("loc").alias("url"),
            udfs.host_of("loc").alias("host"),
            F.lit(1).alias("priority"),
            F.lit(1).alias("page_num"),
        )
        .withColumn("url_hash", udfs.url_hash_col("url"))
    )
    # two URLs already crawled -> anti-joined away
    seen = cand.filter(F.col("url").endswith("p0")).select("url_hash")
    fresh = dedup.dedup_against_seen(cand, seen)
    ranked = politeness.rank_fetch_slots(fresh, budget=3)
    got = {
        r.host: r.cnt
        for r in ranked.filter("scheduled")
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == {"a.example.com": 3, "b.example.com": 2}


class TestQuotaCap:
    """textops.quota_cap — the C4-style per-domain volume cap (lives here
    with the other planning/curation additions of this pass)."""

    def test_cap_binds_and_is_deterministic(self, spark):
        from bbcrawl_spark.operators import textops

        rows = [(i, f"s{i % 3}") for i in range(90)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        a = textops.quota_cap(df, quota=7)
        b = textops.quota_cap(df, quota=7)
        ka = sorted((r.source, r.doc_id) for r in a.collect())
        assert ka == sorted((r.source, r.doc_id) for r in b.collect())
        import collections

        per = collections.Counter(s for s, _ in ka)
        assert per == {"s0": 7, "s1": 7, "s2": 7}

    def test_below_quota_groups_pass_through(self, spark):
        from bbcrawl_spark.operators import textops

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
        )
        assert textops.quota_cap(df, quota=10).count() == 3

    def test_salt_changes_selection_membership_not_size(self, spark):
        from bbcrawl_spark.operators import textops

        df = spark.createDataFrame(
            [(i, "s") for i in range(200)], "doc_id long, source string"
        )
        a = {r.doc_id for r in textops.quota_cap(df, quota=50).collect()}
        b = {
            r.doc_id
            for r in textops.quota_cap(df, quota=50, salt="v2").collect()
        }
        assert len(a) == len(b) == 50 and a != b

    def test_window_group_limit_plan(self, spark):
        """row_number<=k compiles to WindowGroupLimit (map-side partial) —
        the property that makes the cap safe on a 10^9-row host."""
        from bbcrawl_spark.operators import textops

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        plan = (
            textops.quota_cap(df, quota=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan

    def test_rejects_bad_quota(self, spark):
        import pytest

        from bbcrawl_spark.operators import textops

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError):
            textops.quota_cap(df, quota=0)
