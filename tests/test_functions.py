"""UDF / column-expression layer: JVM-vs-Python parity (SURVEY.md §2.12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbcrawl_spark import urlkit
from bbcrawl_spark.functions import udfs
from tests.test_extraction import SRC_PAGE, VB4_PAGE

URLS = [
    "http://Ex.COM:80/A/b?x=1&y=2#frag",
    "https://h:443",
    "https://h:8443/p?q",
    "http://h/path/",
    "HTTP://UPPER.example/MiXeD",
    "http://h:8080/t/p1",
]


class TestCanonicalizeParity:
    def test_col_matches_python(self, spark):
        df = spark.createDataFrame([(u,) for u in URLS], "url string")
        got = {
            r["url"]: r["c"]
            for r in df.select("url", udfs.canonicalize_col("url").alias("c")).collect()
        }
        for u in URLS:
            assert got[u] == urlkit.canonicalize(u), u

    def test_hash_col_matches_python(self, spark):
        df = spark.createDataFrame([(u,) for u in URLS], "url string")
        got = {
            r["url"]: r["h"]
            for r in df.select("url", udfs.url_hash_col("url").alias("h")).collect()
        }
        for u in URLS:
            assert got[u] == urlkit.url_hash(u), u

    def test_udf_matches_col(self, spark):
        df = spark.createDataFrame([(u,) for u in URLS], "url string")
        rows = df.select(
            udfs.canonicalize_col("url").alias("c1"),
            udfs.canonicalize_udf("url").alias("c2"),
        ).collect()
        for r in rows:
            assert r["c1"] == r["c2"]


HEADER_CASES = [
    'attachment; filename="report.pdf"',
    'filename="bare.txt"',
    'attachment; filename="has space.bin"; size=42',
    'attachment;filename="tight.png"',
    "inline",  # no filename field
    None,  # no header at all
    "",  # empty header
    'attachment; filename="a=b.pdf"',  # '=' in name -> malformed (Go split)
    'attachment; filename="path/sep.pdf"',  # '/' rejected
    'attachment; filename=""',  # empty name -> malformed
    'attachment; filename=noquote.pdf',  # field must start filename=" -> none
    'x; filename=""quoted""',  # Trim strips ALL leading/trailing quotes
]


class TestHeaderFilenameParity:
    """F9/K2: column expression == pure-Python NameFromHeader twin on every
    branch (match, missing, malformed, path separator, quote trimming)."""

    def test_col_matches_python(self, spark):
        from bbcrawl_spark import extract

        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(HEADER_CASES)], "i int, hdr string"
        )
        got = {
            r["i"]: (r["name"], r["field"])
            for r in df.select(
                "i",
                udfs.header_filename_col("hdr").alias("name"),
                udfs.header_filename_field_col("hdr").alias("field"),
            ).collect()
        }
        for i, h in enumerate(HEADER_CASES):
            name, err = extract.header_filename(h)
            assert got[i][0] == name, (h, got[i], name, err)
            # field NULL exactly when the reference reports 'No ... found'
            assert (got[i][1] is None) == (err == extract.NO_HEADER_FIELD_ERR), h

    def test_golden_values(self):
        from bbcrawl_spark import extract

        assert extract.header_filename(HEADER_CASES[0]) == ("report.pdf", "")
        assert extract.header_filename(HEADER_CASES[2]) == ("has space.bin", "")
        assert extract.header_filename(None)[1] == extract.NO_HEADER_FIELD_ERR
        assert "malformed" in extract.header_filename('filename="a=b"')[1]
        assert extract.header_filename('x; filename=""quoted""') == ("quoted", "")
        assert extract.complete_headername("123-1", HEADER_CASES[0]) == (
            "123-1-report.pdf", "",
        )

    def test_malformed_error_formats_untrimmed_field(self, spark):
        from bbcrawl_spark import extract
        from bbcrawl_spark.functions.udfs import header_filename_raw_field_col

        # Go formats the RAW field (downloader.go:133): after ';'-split the
        # field keeps its leading space, so the message has TWO spaces
        h = 'attachment; filename="a=b"'
        _, err = extract.header_filename(h)
        assert err == (
            'malformed filename in Content-disposition header:  filename="a=b"'
        )
        # no separator -> no leading space, single space after the colon
        _, err2 = extract.header_filename('filename="a=b"')
        assert err2 == (
            'malformed filename in Content-disposition header: filename="a=b"'
        )
        # the column twin yields the same raw field
        df = spark.createDataFrame([(h,), ('filename="a=b"',)], "hdr string")
        raws = [
            r["raw"]
            for r in df.select(
                header_filename_raw_field_col("hdr").alias("raw")
            ).collect()
        ]
        assert raws == [' filename="a=b"', 'filename="a=b"']


class TestExtractUDFs:
    def test_vb_udf_through_spark(self, spark):
        df = spark.createDataFrame(
            [("http://forum.example:8080/t/1", VB4_PAGE.encode("utf-8"))],
            "url string, html binary",
        )
        rows = (
            df.select(
                F.explode(
                    udfs.extract_vb_udf("html", "url", F.lit(udfs.CT_DEFAULT))
                ).alias("f")
            )
            .select("f.*")
            .where(F.col("err") == "")
            .orderBy("element_index")
            .collect()
        )
        assert [(r["post_id"], r["att_id"], r["out_name"]) for r in rows] == [
            ("101", 1, "101-1-f1.pdf"),
            ("101", 2, "101-2-f2.jpg"),
            ("102", 1, "102-1-abs.png"),
            ("102", 3, "102-3-last.gif"),
        ]

    def test_srcs_udf_through_spark(self, spark):
        udf = udfs.make_extract_srcs_udf()
        df = spark.createDataFrame(
            [("http://media.example:444/g/p9", SRC_PAGE.encode("utf-8"), 7)],
            "url string, html binary, page_num int",
        )
        rows = (
            df.select(
                F.explode(
                    udf("html", "url", "page_num", F.lit(udfs.CT_DEFAULT))
                ).alias("f")
            )
            .select("f.*")
            .where(F.col("err") == "")
            .collect()
        )
        names = {r["link"]: r["out_name"] for r in rows}
        assert names["/pics/a.jpg"] == "7-1.jpg"
        assert names["/v/single.mkv"] == "7-5.mkv"

    def test_text_udf_matches_core(self, spark):
        from bbcrawl_spark import extract

        html = "<body>a<script>no</script>b ü</body>"
        df = spark.createDataFrame([(html.encode("utf-8"),)], "html binary")
        [r] = df.select(
            udfs.extract_text_udf("html", F.lit(udfs.CT_DEFAULT)).alias("t")
        ).collect()
        assert r["t"] == extract.extract_text(html) == "ab ü"
        # the decode ladder through the UDF: cp1252 body + charset header
        df2 = spark.createDataFrame(
            [(html.encode("cp1252"), "text/html; charset=windows-1252")],
            "html binary, ct string",
        )
        [r2] = df2.select(udfs.extract_text_udf("html", "ct").alias("t")).collect()
        assert r2["t"] == "ab ü"

    def test_links_udf(self, spark):
        html = b'<a href="/x">l</a><a href="p2">n</a>'
        df = spark.createDataFrame([("http://h:9/a/b", html)], "url string, html binary")
        rows = (
            df.select(
                F.explode(
                    udfs.extract_links_udf("html", "url", F.lit(udfs.CT_DEFAULT))
                ).alias("l")
            )
            .select("l.abs_url")
            .collect()
        )
        assert [r["abs_url"] for r in rows] == ["http://h/x", "http://h/p2"]

    def test_resolve_udf(self, spark):
        df = spark.createDataFrame(
            [("http://h:8080/t/p1", "a/b.jpg"), ("http://h/t", "http://abs/x")],
            "page string, link string",
        )
        rows = df.select(udfs.resolve_links_udf("page", "link").alias("r")).collect()
        assert [r["r"] for r in rows] == ["http://h/a/b.jpg", "http://abs/x"]


class TestHeaderFilename:
    def test_content_disposition(self, spark):
        df = spark.createDataFrame(
            [
                ('attachment; filename="report.pdf"',),
                ('inline; filename="bad/name.txt"',),
                ("attachment",),
            ],
            "h string",
        )
        rows = df.select(udfs.header_filename_col("h").alias("n")).collect()
        assert [r["n"] for r in rows] == ["report.pdf", "", ""]


class TestHostOf:
    def test_host(self, spark):
        df = spark.createDataFrame(
            [("http://A.Example.com:8080/x?q=1",), ("https://h/y",)], "url string"
        )
        rows = df.select(udfs.host_of("url").alias("h")).collect()
        assert [r["h"] for r in rows] == ["a.example.com", "h"]


class TestNormalizeQuery:
    CASES = [
        # trackers stripped, survivors sorted
        ("http://h.example/p?b=2&utm_source=x&a=1", "http://h.example/p?a=1&b=2"),
        ("http://h.example/p?gclid=abc&fbclid=def", "http://h.example/p"),
        ("http://h.example/p?a=1&jsessionid=Z9", "http://h.example/p?a=1"),
        # no query / already clean
        ("http://h.example/p", "http://h.example/p"),
        ("http://h.example/p?a=1", "http://h.example/p?a=1"),
        # fragment preserved (canonicalize drops it later, separately)
        ("http://h.example/p?utm_medium=m&z=1#sec", "http://h.example/p?z=1#sec"),
        # a '?' inside the fragment is NOT a query
        ("http://h.example/p#frag?utm_source=x", "http://h.example/p#frag?utm_source=x"),
        # utm_ prefix must be a parameter NAME, not a value
        ("http://h.example/p?q=utm_source", "http://h.example/p?q=utm_source"),
    ]

    def test_expected(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in self.CASES], "u string")
        got = [
            r["n"]
            for r in df.select(udfs.normalize_query_col("u").alias("n")).collect()
        ]
        assert got == [want for _, want in self.CASES]

    def test_sort_off_keeps_order(self, spark):
        df = spark.createDataFrame(
            [("http://h/p?b=2&utm_source=x&a=1",)], "u string"
        )
        got = df.select(
            udfs.normalize_query_col("u", sort_params=False).alias("n")
        ).collect()[0]["n"]
        assert got == "http://h/p?b=2&a=1"

    def test_folds_aliases_onto_one_seen_key(self, spark):
        # the point of the pass: campaign-tagged and re-ordered variants of
        # one page hash to ONE url_hash after normalize -> canonicalize
        variants = [
            "http://h.example/p?a=1&b=2",
            "http://h.example/p?b=2&a=1",
            "http://h.example/p?utm_campaign=news&a=1&b=2",
            "HTTP://h.example:80/p?gclid=x&b=2&a=1#top",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "u string")
        hashes = {
            r["h"]
            for r in df.select(
                udfs.url_hash_col(udfs.normalize_query_col("u")).alias("h")
            ).collect()
        }
        assert len(hashes) == 1

    def test_stays_jvm(self, spark):
        df = spark.createDataFrame([("http://h/p?a=1",)], "u string")
        plan = (
            df.select(udfs.normalize_query_col("u").alias("n"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan and "Exchange" not in plan

    def test_duckdb_replays_identically(self, spark):
        import duckdb

        con = duckdb.connect()
        urls = "[" + ", ".join(f"'{u}'" for u, _ in self.CASES) + "]"
        duck = [
            r[0]
            for r in con.execute(f"""
                WITH u AS (SELECT unnest({urls}) AS url),
                p AS (SELECT url,
                        regexp_extract(url, '^([^?#]*)', 1) AS pre,
                        regexp_extract(url, '^[^#]*\\?([^#]*)', 1) AS q,
                        regexp_extract(url, '^[^#]*(#.*)', 1) AS frag
                      FROM u),
                -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's is ''
                c AS (SELECT *, coalesce(array_to_string(list_sort(list_filter(
                        string_split(q, '&'),
                        x -> NOT regexp_matches(x, '{udfs.TRACKING_PARAMS_RE}'))), '&'), '') AS cleaned
                      FROM p)
                SELECT pre || CASE WHEN cleaned = '' THEN ''
                                   ELSE '?' || cleaned END || frag
                FROM c
            """).fetchall()
        ]
        assert duck == [want for _, want in self.CASES]
