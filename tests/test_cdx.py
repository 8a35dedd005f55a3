"""CDX(J) index source (sources/cdx.py): SURT key generation, line
parsing (limit-3 split + JSON payload), gz shard reading, and the
latest-capture recrawl dedup — all JVM-side, plan-pinned."""

from __future__ import annotations

import gzip

import pytest

from bbcrawl_spark.sources import cdx

LINE = (
    'com,example)/p?q=1 20240101123000 {"url": "http://example.com/p?q=1", '
    '"mime": "text/html", "status": "200", "digest": "sha1:ABCD", '
    '"length": "1234", "offset": "5678", "filename": "seg-00.warc.gz"}'
)


class TestParseCdxLines:
    def test_full_line(self, spark):
        df = spark.createDataFrame([(LINE,)], "line string")
        r = cdx.parse_cdx_lines(df).collect()[0]
        assert r["surt"] == "com,example)/p?q=1"
        assert r["fetch_ts"].strftime("%Y%m%d%H%M%S") == "20240101123000"
        assert r["url"] == "http://example.com/p?q=1"
        assert r["status"] == 200
        assert r["mime"] == "text/html"
        assert r["digest"] == "sha1:ABCD"
        assert r["warc_filename"] == "seg-00.warc.gz"
        assert (r["warc_offset"], r["warc_length"]) == (5678, 1234)

    def test_malformed_lines_become_nulls_not_errors(self, spark):
        # NULL-on-malformed contract: short lines, bad timestamps, and
        # non-numeric payload fields must not abort an ANSI-mode scan.
        df = spark.createDataFrame(
            [("justonefield",),
             ('org,x)/ 2024 {"url": "http://x.org/", "status": "oops"}',)],
            "line string",
        )
        rows = cdx.parse_cdx_lines(df).orderBy("surt").collect()
        assert rows[0]["surt"] == "justonefield"
        assert rows[0]["url"] is None and rows[0]["fetch_ts"] is None
        assert rows[1]["fetch_ts"] is None  # '2024' is not a ts14
        assert rows[1]["status"] is None    # 'oops' fails the int try_cast
        assert rows[1]["url"] == "http://x.org/"

    def test_parse_stays_jvm(self, spark):
        df = spark.createDataFrame([(LINE,)], "line string")
        plan = (
            cdx.parse_cdx_lines(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "EvalPython" not in plan, plan


class TestSurtKey:
    CASES = [
        ("http://www.Example.com/a/b?q=1#f", "com,example,www)/a/b?q=1"),
        ("https://example.com:8443/x", "com,example:8443)/x"),
        ("http://example.com:80/x", "com,example)/x"),      # default port
        ("https://example.com:443", "com,example)/"),       # default + no path
        ("http://example.com", "com,example)/"),            # empty path -> /
        ("http://user:pw@sub.ex.com/x", "com,ex,sub)/x"),   # userinfo dropped
        ("http://EX.com/Case/Kept?Q=V", "com,ex)/Case/Kept?Q=V"),
        ("http://example.com?q=1", "com,example)/?q=1"),  # query, no path
    ]

    def test_expected_keys(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "u string")
        got = [r["s"] for r in df.select(cdx.surt_key_col("u").alias("s")).collect()]
        assert got == [want for _, want in self.CASES]

    def test_http_https_recrawls_share_key(self, spark):
        df = spark.createDataFrame(
            [("http://example.com/p",), ("https://example.com/p",)], "u string"
        )
        keys = {r["s"] for r in df.select(cdx.surt_key_col("u").alias("s")).collect()}
        assert keys == {"com,example)/p"}


class TestReadCdx:
    def test_plain_and_gz_shards(self, spark, tmp_path):
        lines = [LINE, ""]
        (tmp_path / "shard-00").write_text("\n".join(lines))
        (tmp_path / "shard-01.gz").write_bytes(
            gzip.compress(LINE.replace("com,example", "org,other").encode())
        )
        df = cdx.read_cdx(spark, str(tmp_path))
        assert sorted(r["surt"] for r in df.collect()) == [
            "com,example)/p?q=1", "org,other)/p?q=1",
        ]  # blank line dropped, gz decompressed by extension


class TestLatestCaptures:
    def _cap(self, surt, ts, off, fn="f.warc.gz"):
        return (
            f'{surt} {ts} {{"url": "http://x/", "status": "200", '
            f'"offset": "{off}", "filename": "{fn}"}}'
        )

    def test_keeps_newest_per_surt(self, spark):
        df = spark.createDataFrame(
            [(self._cap("com,a)/", "20240101000000", 1),),
             (self._cap("com,a)/", "20240301000000", 2),),
             (self._cap("com,b)/", "20240201000000", 3),)],
            "line string",
        )
        kept = cdx.latest_captures(cdx.parse_cdx_lines(df))
        got = {r["surt"]: r["warc_offset"] for r in kept.collect()}
        assert got == {"com,a)/": 2, "com,b)/": 3}

    def test_equal_ts_tiebreak_deterministic(self, spark):
        df = spark.createDataFrame(
            [(self._cap("com,a)/", "20240101000000", 7),),
             (self._cap("com,a)/", "20240101000000", 9),)],
            "line string",
        )
        kept = cdx.latest_captures(cdx.parse_cdx_lines(df)).collect()
        assert len(kept) == 1 and kept[0]["warc_offset"] == 9


class TestRecrawlSchedule:
    DAY = 86_400

    def _caps(self, spark, rows):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows, "surt string, ts_s string, digest string"
        )
        return df.select(
            "surt", F.to_timestamp("ts_s").alias("fetch_ts"), "digest"
        )

    def test_change_rate_estimation_and_due(self, spark):
        # com,a: 3 captures over 10 days, 3 versions -> span/(3-1) = 5 days.
        # last capture Jan 11 + 5d = Jan 16 <= Feb 1 -> due.
        # com,b: 2 same-digest captures -> never changed -> max interval
        # (30d); Jan 11 + 30d = Feb 10 > Feb 1 -> not due.
        df = self._caps(spark, [
            ("com,a)/", "2024-01-01 00:00:00", "v1"),
            ("com,a)/", "2024-01-06 00:00:00", "v2"),
            ("com,a)/", "2024-01-11 00:00:00", "v3"),
            ("com,b)/", "2024-01-01 00:00:00", "same"),
            ("com,b)/", "2024-01-11 00:00:00", "same"),
        ])
        got = {
            r["surt"]: r
            for r in cdx.recrawl_schedule(df, "2024-02-01 00:00:00").collect()
        }
        a, b = got["com,a)/"], got["com,b)/"]
        assert (a["n_captures"], a["n_versions"]) == (3, 3)
        assert a["interval_s"] == 5 * self.DAY
        assert a["next_due_ts"].strftime("%Y-%m-%d") == "2024-01-16"
        assert a["due"] is True
        assert (b["n_captures"], b["n_versions"]) == (2, 1)
        assert b["interval_s"] == 30 * self.DAY and b["due"] is False

    def test_interval_clamped_both_ways(self, spark):
        # fast flapper: 3 versions within 2 hours -> raw est 1h, clamped UP
        # to min_interval (1 day). stale drifter: 2 versions 90 days apart
        # -> raw est 90d, clamped DOWN to max_interval (30 days).
        df = self._caps(spark, [
            ("com,fast)/", "2024-01-01 00:00:00", "v1"),
            ("com,fast)/", "2024-01-01 01:00:00", "v2"),
            ("com,fast)/", "2024-01-01 02:00:00", "v3"),
            ("com,slow)/", "2024-01-01 00:00:00", "v1"),
            ("com,slow)/", "2024-03-31 00:00:00", "v2"),
        ])
        got = {
            r["surt"]: r["interval_s"]
            for r in cdx.recrawl_schedule(df, "2024-04-01 00:00:00").collect()
        }
        assert got["com,fast)/"] == self.DAY
        assert got["com,slow)/"] == 30 * self.DAY

    def test_single_capture_gets_max_interval(self, spark):
        df = self._caps(spark, [("com,one)/", "2024-01-01 00:00:00", "v1")])
        r = cdx.recrawl_schedule(df, "2024-01-02 00:00:00").collect()[0]
        assert (r["n_captures"], r["n_versions"]) == (1, 1)
        assert r["interval_s"] == 30 * self.DAY and r["due"] is False

    def test_two_partial_aggregated_exchanges_no_window_no_python(self, spark):
        # count_distinct(digest) expands to the standard two-phase distinct
        # aggregate: exchange on (surt, digest) then on surt — both behind
        # map-side partial aggregation (one row per distinct pair / key
        # crosses the wire, never one per capture). No window, no join.
        df = self._caps(spark, [("com,a)/", "2024-01-01 00:00:00", "v1")])
        plan = (
            cdx.recrawl_schedule(df, "2024-02-01 00:00:00")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 2, plan
        # each exchange is fed by a partial HashAggregate (map-side combine)
        for seg in plan.split("Exchange")[1:]:
            assert "HashAggregate" in seg, plan
        assert "EvalPython" not in plan and "Window" not in plan


def test_due_recrawls_feed_the_crawl_frontier(spark):
    """Integration: recrawl planning ends in the scheduler — due SURTs join
    back to their latest capture's URL, become frontier candidates, and
    politeness-rank per host like any sitemap/pager batch."""
    from pyspark.sql import functions as F

    from bbcrawl_spark.functions import udfs
    from bbcrawl_spark.operators import politeness

    def cap(surt, url, ts, digest):
        return (
            f'{surt} {ts} {{"url": "{url}", "status": "200", '
            f'"digest": "sha1:{digest}", "offset": "1", "filename": "f.warc.gz"}}'
        )

    lines = spark.createDataFrame(
        [
            # a: changed across captures -> est 10d -> due by Feb 1
            (cap("com,a)/", "http://a.com/", "20240101000000", "v1"),),
            (cap("com,a)/", "http://a.com/", "20240111000000", "v2"),),
            # b: never changed -> max interval 30d -> NOT due by Feb 1
            (cap("com,b)/", "http://b.com/", "20240101000000", "same"),),
            (cap("com,b)/", "http://b.com/", "20240111000000", "same"),),
            # c: changed -> due
            (cap("com,c)/", "http://c.com/", "20240101000000", "x1"),),
            (cap("com,c)/", "http://c.com/", "20240106000000", "x2"),),
        ],
        "line string",
    )
    parsed = cdx.parse_cdx_lines(lines)
    due = (
        cdx.recrawl_schedule(parsed, "2024-02-01 00:00:00")
        .filter("due")
        .select("surt")
    )
    cand = (
        cdx.latest_captures(parsed)
        .join(due, "surt")
        .select(
            "url",
            udfs.host_of("url").alias("host"),
            F.lit(1).alias("priority"),
            F.lit(1).alias("page_num"),
        )
        .withColumn("url_hash", udfs.url_hash_col("url"))
    )
    ranked = politeness.rank_fetch_slots(cand, budget=5)
    scheduled = {r["url"] for r in ranked.filter("scheduled").collect()}
    assert scheduled == {"http://a.com/", "http://c.com/"}


class TestFetchPlan:
    def _caps(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, warc_filename string, warc_offset long, warc_length long"
        )

    def test_offset_order_task_runs_and_file_totals(self, spark):
        df = self._caps(spark, [
            ("u3", "seg-a.warc.gz", 300, 10),
            ("u1", "seg-a.warc.gz", 100, 20),
            ("u2", "seg-a.warc.gz", 200, 30),
            ("u9", "seg-b.warc.gz", 50, 5),
        ])
        got = {
            r["url"]: r
            for r in cdx.fetch_plan(df, ranges_per_task=2).collect()
        }
        # read_seq follows offset order WITHIN each file
        assert [got[u]["read_seq"] for u in ("u1", "u2", "u3")] == [0, 1, 2]
        assert got["u9"]["read_seq"] == 0
        # contiguous offset runs share a task
        assert [got[u]["task_id"] for u in ("u1", "u2", "u3")] == [0, 0, 1]
        # per-file totals
        assert got["u1"]["n_file_ranges"] == 3 and got["u1"]["file_bytes"] == 60
        assert got["u9"]["n_file_ranges"] == 1 and got["u9"]["file_bytes"] == 5

    def test_single_exchange_both_windows_reuse_it(self, spark):
        df = self._caps(spark, [("u", "f", 1, 1)])
        plan = (
            cdx.fetch_plan(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan
        assert "EvalPython" not in plan

    def test_coalesce_gap_groups_adjacent_ranges(self, spark):
        # ranges at 0(+100), 100(+50), 400(+10), 2000(+5): gaps 0, 250, 1590
        # -> threshold 300 coalesces the first three into one request; the
        # far range starts request 1
        df = self._caps(spark, [
            ("u0", "f", 0, 100),
            ("u1", "f", 100, 50),
            ("u2", "f", 400, 10),
            ("u3", "f", 2000, 5),
            ("v0", "g", 7, 1),  # other file restarts at request 0
        ])
        got = {
            r["url"]: r["request_id"]
            for r in cdx.fetch_plan(df, coalesce_gap=300).collect()
        }
        assert got == {"u0": 0, "u1": 0, "u2": 0, "u3": 1, "v0": 0}
        # a tighter threshold splits u2 off as well
        tight = {
            r["url"]: r["request_id"]
            for r in cdx.fetch_plan(df, coalesce_gap=100).collect()
        }
        assert tight == {"u0": 0, "u1": 0, "u2": 1, "u3": 2, "v0": 0}

    def test_coalesce_still_single_exchange(self, spark):
        df = self._caps(spark, [("u", "f", 1, 1)])
        plan = (
            cdx.fetch_plan(df, coalesce_gap=100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan
