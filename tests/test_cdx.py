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
