"""Warehouse snapshot semantics (SURVEY.md §2.2 K3, §7.6 fallback)."""

from __future__ import annotations

import pytest

from bbcrawl_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v long")


class TestSnapshots:
    def test_write_read_roundtrip(self, spark, wh):
        wh.write("t", _df(spark, [1, 2, 3]))
        assert sorted(r["v"] for r in wh.read("t").collect()) == [1, 2, 3]

    def test_overwrite_keeps_old_snapshot_readable(self, spark, wh):
        s1 = wh.write("t", _df(spark, [1]))
        s2 = wh.write("t", _df(spark, [2]))
        assert [r["v"] for r in wh.read("t", s1).collect()] == [1]
        assert [r["v"] for r in wh.read("t", s2).collect()] == [2]
        assert wh.current_snapshot("t") == s2

    def test_append_accumulates(self, spark, wh):
        wh.write("t", _df(spark, [1]))
        wh.append("t", _df(spark, [2]))
        wh.append("t", _df(spark, [3]))
        assert sorted(r["v"] for r in wh.read("t").collect()) == [1, 2, 3]

    def test_append_pinned_parent_skips_orphan(self, spark, wh):
        s1 = wh.write("t", _df(spark, [1]))
        wh.append("t", _df(spark, [99]))  # orphan (crashed round)
        s3 = wh.append("t", _df(spark, [2]), parent_snapshot=s1)
        assert sorted(r["v"] for r in wh.read("t", s3).collect()) == [1, 2]

    def test_append_empty_parent_sentinel(self, spark, wh):
        wh.write("t", _df(spark, [1]))
        s = wh.append("t", _df(spark, [7]), parent_snapshot="")
        assert [r["v"] for r in wh.read("t", s).collect()] == [7]

    def test_missing_table_raises(self, wh):
        with pytest.raises(FileNotFoundError):
            wh.read("nope")


class TestRoundLog:
    def test_commit_and_query(self, spark, wh):
        s0 = wh.write("frontier", _df(spark, [1]))
        wh.commit_round(0, {"frontier": s0}, {"n": 1})
        assert wh.last_committed_round() == 0
        assert wh.round_snapshot(0, "frontier") == s0
        assert wh.round_snapshot(0, "other") is None
        assert wh.round_snapshot(5, "frontier") is None

    def test_uncommitted_snapshot_invisible_to_round_log(self, spark, wh):
        s0 = wh.write("frontier", _df(spark, [1]))
        wh.commit_round(0, {"frontier": s0})
        wh.write("frontier", _df(spark, [2, 3]))  # crashed round r=1, no commit
        assert wh.last_committed_round() == 0
        pinned = wh.round_snapshot(0, "frontier")
        assert [r["v"] for r in wh.read("frontier", pinned).collect()] == [1]
