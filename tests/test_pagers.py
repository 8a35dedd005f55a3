"""Pager golden sequences — every case from the reference test suite
(/root/reference/libcrawl/pagers_test.go:49-61) plus query/vb4 semantics
(pagers.go:36-48, 223-248). FIXTURES.md §A."""

from __future__ import annotations

import pytest

from bbcrawl_spark import pagers
from bbcrawl_spark.pagers import CutterPagerSpec, QueryPagerSpec, VB4PagerSpec

# (blueprint addr, printf-format of expected url, flags) — verbatim from
# pagers_test.go:50-60
CUTTER_GOLDEN = [
    ("http://www.example.net/1/test", "http://www.example.net/%d/test",
     dict(start=1, end=100, cut=(24, 1))),
    ("http://www.example.net/1/test", "http://www.example.net/%d/test",
     dict(start=1, end=100, cut=(-6, 1))),
    ("http://www.example.net/666/test", "http://www.example.net/%d/test",
     dict(start=1, end=100, cut=(24, 3))),
    ("http://www.example.net/666/test", "http://www.example.net/%d/test",
     dict(start=1, end=100, cut=(-8, 3))),
    ("http://www.example.net/1/test", "http://www.example.net/%05d/test",
     dict(start=1, end=100, cut=(24, 1), digits=5)),
    ("http://www.example.net/1", "http://www.example.net/%d",
     dict(start=1, end=100, cut=(24, 1))),
    ("http://www.example.net/1", "http://www.example.net/%d",
     dict(start=1, end=100, cut=(-1, 1))),
    ("http://www.example.net/page/", "http://www.example.net/page%d/",
     dict(start=1, end=100, cut=(28, 0))),
    ("http://www.example.net/1", "http://www.example.net/%05d",
     dict(start=1, end=100, cut=(24, 1), digits=5)),
    ("http://www.example.net/1/", "http://www.example.net/%d/",
     dict(start=1, end=100, cut=(24, 1))),
    ("http://www.example.net/1/", "http://www.example.net/%d/",
     dict(start=1, end=100, cut=(24, 1), startpage="http://www.example.net")),
]


def _expected_urls(fmt: str, flags: dict) -> list[str]:
    urls = []
    if flags.get("startpage"):
        urls.append(flags["startpage"])
    digits = flags.get("digits", 0)
    for p in range(flags["start"], flags["end"] + 1):
        if digits:
            urls.append(fmt % p)  # %05d handled by printf-format itself
        else:
            urls.append(fmt % p)
    return urls


def _collect_urls(df) -> list[str]:
    return [r["url"] for r in df.orderBy("ord").collect()]


class TestCutterGolden:
    @pytest.mark.parametrize("addr,fmt,flags", CUTTER_GOLDEN)
    def test_spark_sequence(self, spark, addr, fmt, flags):
        spec = CutterPagerSpec(url=addr, **flags)
        assert _collect_urls(pagers.cutter_frontier(spark, spec)) == _expected_urls(fmt, flags)

    @pytest.mark.parametrize("addr,fmt,flags", CUTTER_GOLDEN)
    def test_oracle_sequence(self, addr, fmt, flags):
        spec = CutterPagerSpec(url=addr, **flags)
        assert [u for _, _, u in pagers.pager_sequence(spec)] == _expected_urls(fmt, flags)

    def test_step_and_adjust(self, spark):
        # step multiplies the substituted number (pagers.go:125: page*step);
        # adjust shifts PageNum only (pagers.go:133-135)
        spec = CutterPagerSpec(
            url="http://h/1/x", start=1, end=4, cut=(10, 1), step=10, adjust=5
        )
        rows = pagers.cutter_frontier(spark, spec).orderBy("ord").collect()
        assert [r["url"] for r in rows] == [
            "http://h/10/x", "http://h/20/x", "http://h/30/x", "http://h/40/x"
        ]
        assert [r["page_num"] for r in rows] == [6, 7, 8, 9]

    def test_startpage_page_num(self, spark):
        # while crawling the startpage the Go pager reports start-1+adjust
        spec = CutterPagerSpec(
            url="http://h/1/", start=1, end=2, cut=(10, 1), startpage="http://h"
        )
        rows = pagers.cutter_frontier(spark, spec).orderBy("ord").collect()
        assert rows[0]["url"] == "http://h"
        assert rows[0]["page_num"] == 0
        assert [r["page_num"] for r in rows[1:]] == [1, 2]

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="cannot be 0"):
            CutterPagerSpec(url="http://h/1", start=1, end=2, cut=(0, 1))
        with pytest.raises(ValueError, match="end must not be smaller"):
            CutterPagerSpec(url="http://h/1", start=5, end=2, cut=(9, 1))
        with pytest.raises(ValueError, match="digits"):
            CutterPagerSpec(url="http://h/1", start=1, end=100, cut=(9, 1), digits=2)
        with pytest.raises(ValueError, match="negative amount"):
            CutterPagerSpec(url="http://h/1", start=1, end=2, cut=(9, -1))
        with pytest.raises(ValueError, match="out of range"):
            CutterPagerSpec(url="http://h/1", start=1, end=2, cut=(99, 1))


class TestQueryPager:
    def test_sequence_sorted_keys(self, spark):
        # Go url.Values.Encode sorts keys: existing params stay, page var set
        spec = QueryPagerSpec(
            url="http://h/forum?z=9&a=1", start=2, end=4, name="page"
        )
        urls = _collect_urls(pagers.query_frontier(spark, spec))
        assert urls == [
            "http://h/forum?a=1&page=2&z=9",
            "http://h/forum?a=1&page=3&z=9",
            "http://h/forum?a=1&page=4&z=9",
        ]

    def test_no_existing_query(self, spark):
        spec = QueryPagerSpec(url="http://h/t", start=1, end=2)
        assert _collect_urls(pagers.query_frontier(spark, spec)) == [
            "http://h/t?page=1",
            "http://h/t?page=2",
        ]

    def test_page_var_replaced(self, spark):
        # query.Set replaces any pre-existing value of the page var
        spec = QueryPagerSpec(url="http://h/t?page=77&b=2", start=1, end=1)
        assert _collect_urls(pagers.query_frontier(spark, spec)) == [
            "http://h/t?b=2&page=1"
        ]

    def test_escaped_values(self, spark):
        spec = QueryPagerSpec(url="http://h/t?q=a b", start=1, end=1)
        assert _collect_urls(pagers.query_frontier(spark, spec)) == [
            "http://h/t?page=1&q=a+b"
        ]

    def test_oracle_matches_spark(self, spark):
        spec = QueryPagerSpec(url="http://h/f?x=1", start=3, end=7, name="p")
        assert [u for _, _, u in pagers.pager_sequence(spec)] == _collect_urls(
            pagers.query_frontier(spark, spec)
        )


class TestVB4Pager:
    def test_page1_bare(self, spark):
        spec = VB4PagerSpec(url="http://h/threads/42-topic", start=1, end=3)
        assert _collect_urls(pagers.vb4_frontier(spark, spec)) == [
            "http://h/threads/42-topic",
            "http://h/threads/42-topic/page2",
            "http://h/threads/42-topic/page3",
        ]

    def test_trailing_slash_no_double(self, spark):
        spec = VB4PagerSpec(url="http://h/t/", start=2, end=3)
        assert _collect_urls(pagers.vb4_frontier(spark, spec)) == [
            "http://h/t/page2",
            "http://h/t/page3",
        ]

    def test_start_after_one(self, spark):
        spec = VB4PagerSpec(url="http://h/t", start=5, end=6)
        assert _collect_urls(pagers.vb4_frontier(spark, spec)) == [
            "http://h/t/page5",
            "http://h/t/page6",
        ]

    def test_oracle_matches_spark(self, spark):
        spec = VB4PagerSpec(url="http://h/t", start=1, end=5)
        assert [u for _, _, u in pagers.pager_sequence(spec)] == _collect_urls(
            pagers.vb4_frontier(spark, spec)
        )
