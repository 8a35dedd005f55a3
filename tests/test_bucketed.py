"""Bucketed seen-set storage (sources/bucketed.py): the per-round exact
anti-join must read the 10^10-row seen side in place — one exchange total,
on the frontier side only — and survive catalog restarts + delta appends.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from bbcrawl_spark.sources import bucketed

BUCKETS = 8


@contextmanager
def _no_broadcast(spark):
    # the seen side is never broadcastable at 10^10 rows; pin the SMJ/SHJ
    # regime the design targets
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_anti_join_matches_plain_and_shuffles_one_side(spark, tmp_path):
    seen = _hashes(spark, 0, 10_000)
    frontier = _hashes(spark, 5_000, 15_000)
    bucketed.write_bucketed(seen, "seen_bkt_a", str(tmp_path / "seen"), BUCKETS)
    with _no_broadcast(spark):
        new = bucketed.anti_join_new(frontier, spark, "seen_bkt_a")
        expected = frontier.join(seen, "url_hash", "left_anti")
        assert new.count() == expected.count() == 5_000

        plan = _plan(bucketed.anti_join_new(frontier, spark, "seen_bkt_a"))
    # ONE exchange in the whole join: the frontier side. The seen scan is
    # bucketed and feeds the join without any Exchange above it.
    assert plan.count("Exchange") == 1
    assert "Bucketed: true" in plan
    assert f"SelectedBucketsCount: {BUCKETS} out of {BUCKETS}" in plan
    # the single exchange sits above the frontier's Range, not the FileScan
    assert plan.index("Exchange") < plan.index("FileScan")


def test_append_delta_only_and_plan_property_survives(spark, tmp_path):
    path = str(tmp_path / "seen")
    bucketed.write_bucketed(_hashes(spark, 0, 1_000), "seen_bkt_b", path, BUCKETS)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    bucketed.append_bucketed(_hashes(spark, 1_000, 1_200), "seen_bkt_b", path, BUCKETS)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after > n_before  # delta files added...
    assert spark.table("seen_bkt_b").count() == 1_200  # ...nothing rewritten

    frontier = _hashes(spark, 500, 2_000)
    with _no_broadcast(spark):
        new = bucketed.anti_join_new(frontier, spark, "seen_bkt_b")
        assert new.count() == 800  # ids 1200..1999
        plan = _plan(bucketed.anti_join_new(frontier, spark, "seen_bkt_b"))
    assert plan.count("Exchange") == 1 and "Bucketed: true" in plan


def test_point_probe_prunes_to_one_bucket(spark, tmp_path):
    bucketed.write_bucketed(
        _hashes(spark, 0, 10_000), "seen_bkt_c", str(tmp_path / "seen"), BUCKETS
    )
    probe = spark.table("seen_bkt_c").limit(1).collect()[0]["url_hash"]
    # autoBucketedScan only values shuffle elimination; for key-probe reads
    # (the reference's Exists() lookup) pruning needs the bucketed scan kept
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        scan = spark.table("seen_bkt_c").filter(F.col("url_hash") == probe)
        assert scan.count() == 1
        assert f"SelectedBucketsCount: 1 out of {BUCKETS}" in _plan(scan)
    finally:
        spark.conf.set(key, old)


def test_register_reattaches_after_catalog_restart(spark, tmp_path):
    path = str(tmp_path / "seen")
    bucketed.write_bucketed(_hashes(spark, 0, 2_000), "seen_bkt_d", path, BUCKETS)
    # external table: dropping the catalog entry (= session restart) keeps data
    spark.sql("DROP TABLE seen_bkt_d")
    assert os.path.isdir(path)
    bucketed.register_bucketed(
        spark, "seen_bkt_d", path, BUCKETS, "url_hash BIGINT"
    )
    assert spark.table("seen_bkt_d").count() == 2_000
    frontier = _hashes(spark, 1_000, 3_000)
    with _no_broadcast(spark):
        assert bucketed.anti_join_new(frontier, spark, "seen_bkt_d").count() == 1_000
        plan = _plan(bucketed.anti_join_new(frontier, spark, "seen_bkt_d"))
    assert plan.count("Exchange") == 1 and "Bucketed: true" in plan


def test_compact_shrinks_files_keeps_rows_and_bucketing(spark, tmp_path):
    path = str(tmp_path / "seen")
    bucketed.write_bucketed(_hashes(spark, 0, 1_000), "seen_bkt_e", path, BUCKETS)
    for i in range(3):
        bucketed.append_bucketed(
            _hashes(spark, 1_000 + 100 * i, 1_100 + 100 * i),
            "seen_bkt_e", path, BUCKETS,
        )
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    before = {r["url_hash"] for r in spark.table("seen_bkt_e").collect()}

    new_path = str(tmp_path / "seen_v2")
    bucketed.compact_bucketed(spark, "seen_bkt_e", new_path, BUCKETS)
    n_compact = len([f for f in os.listdir(new_path) if f.endswith(".parquet")])
    assert n_compact < n_files
    after = {r["url_hash"] for r in spark.table("seen_bkt_e").collect()}
    assert after == before
    with _no_broadcast(spark):
        plan = _plan(
            bucketed.anti_join_new(_hashes(spark, 0, 10), spark, "seen_bkt_e")
        )
    assert plan.count("Exchange") == 1 and "Bucketed: true" in plan


def test_bucketed_store_is_a_drop_in_exact_confirm_backend(spark, tmp_path):
    """Integration: a seen snapshot read from the warehouse, re-laid-out as
    the bucketed table, confirms the same survivor set the round loop's
    dedup_against_seen computes — with the seen side never re-shuffled."""
    from bbcrawl_spark.operators import dedup
    from bbcrawl_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("seen", _hashes(spark, 0, 5_000))
    snap = wh.read("seen")
    bucketed.write_bucketed(snap, "seen_bkt_f", str(tmp_path / "bkt"), BUCKETS)
    cand = _hashes(spark, 2_500, 7_500)
    want = {r["url_hash"] for r in dedup.dedup_against_seen(cand, snap).collect()}
    with _no_broadcast(spark):
        got = {
            r["url_hash"]
            for r in bucketed.anti_join_new(cand, spark, "seen_bkt_f").collect()
        }
    assert got == want and len(got) == 2_500


def test_politeness_over_host_bucketed_frontier_is_exchange_free(spark, tmp_path):
    """A frontier PERSISTED bucketed by host (each round's frontier is a
    warehouse table already) feeds the politeness ranking with ZERO
    exchanges: the window's required distribution is satisfied by the
    bucketed scan, so the round's dominant shuffle disappears whenever the
    frontier is read back from storage rather than derived mid-plan."""
    from bbcrawl_spark.operators import politeness

    f = spark.range(0, 10_000).select(
        F.concat(F.lit("h"), (F.col("id") % 97).cast("string")).alias("host"),
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url"),
        F.lit(1).alias("priority"),
        (F.col("id") % 7).cast("int").alias("page_num"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
    )
    bucketed.write_bucketed(f, "frontier_bkt", str(tmp_path / "fr"), BUCKETS, key="host")
    ranked = politeness.rank_fetch_slots(spark.table("frontier_bkt"), budget=5)
    assert ranked.filter("scheduled").count() == 97 * 5
    plan = _plan(
        politeness.rank_fetch_slots(spark.table("frontier_bkt"), budget=5)
    )
    assert plan.count("Exchange") == 0, plan
    assert "Bucketed: true" in plan


def test_bloom_prefilter_composes_with_bucketed_confirm(spark, tmp_path):
    """The full 10^10-design seen check: the Bloom pass prunes the
    definitely-new frontier rows MAP-SIDE, and only the maybe-seen
    remainder reaches the bucketed exact confirm — whose seen side is read
    in place. Composition is exact (no false negatives + exact confirm)
    and equals the plain anti-join."""
    from bbcrawl_spark.operators import dedup

    seen = _hashes(spark, 0, 20_000)
    bucketed.write_bucketed(seen, "seen_bkt_g", str(tmp_path / "bkt"), BUCKETS)
    dedup.build_partitioned_bloom(seen, str(tmp_path / "bloom"), num_partitions=8)
    spec = dedup.BloomSpec(str(tmp_path / "bloom"), 8)

    frontier = _hashes(spark, 10_000, 30_000)
    flagged = dedup.bloom_maybe_seen(frontier, spec)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter("maybe_seen").drop("maybe_seen")
    with _no_broadcast(spark):
        confirmed_new = bucketed.anti_join_new(maybe, spark, "seen_bkt_g")
        got = {
            r["url_hash"]
            for r in definitely_new.unionByName(confirmed_new).collect()
        }
    want = {
        r["url_hash"]
        for r in frontier.join(seen, "url_hash", "left_anti").collect()
    }
    assert got == want and len(got) == 10_000
    # the confirm join only saw the maybe-seen fraction: all 10k truly-seen
    # rows plus the Bloom's (small) false positives on the new half
    n_maybe = maybe.count()
    assert 10_000 <= n_maybe < 11_000, n_maybe
