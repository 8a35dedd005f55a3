"""Driver-contract gate rehearsal: every queries() entry with an oracle_sql()
twin must match DuckDB on row count, column set, and order-insensitive
values at sf0.01 — this mirrors what the driver records in
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_all_queries_have_entry_or_rows_only():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    # only genuinely non-SQL-expressible ops may skip the oracle
    assert rows_only <= {
        "minhash_dedup_docs", "simhash_pairs_docs", "ann_lsh_knn", "ann_ivf_knn",
        "ann_recall", "near_dup_recall", "minhash_lsh_recall", "simhash_closure_check",
        "multimodal_features", "multimodal_audio", "bloom_incremental", "crawl_roundtrip",
        "incremental_dedup_near", "frontier_cardinality",
    }


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "fetch_rank" in df.columns


@pytest.mark.parametrize(
    "name", ["minhash_dedup_docs", "simhash_pairs_docs", "ann_lsh_knn", "ann_ivf_knn",
             "ann_recall", "near_dup_recall", "minhash_lsh_recall", "simhash_closure_check",
             "multimodal_features", "multimodal_audio", "bloom_incremental",
             "incremental_dedup_near", "frontier_cardinality"]
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_frontier_cardinality_sketch_accuracy(spark):
    """The HLL metrics row self-checks: per-host approx vs exact distinct
    URL counts within 5% (rsd 1%; measured max 3.03%) — the fixed-memory
    cardinality path a 10^10-URL frontier's metrics refresh needs."""
    rows = entry_mod.queries()["frontier_cardinality"](spark, SF_DIR).collect()
    assert len(rows) > 10
    assert max(r.abs_err_e4 for r in rows) <= 500


def test_incremental_dedup_near_survivors(spark):
    """The near screen drops every %4 near-variant (tail-appended text, true
    Jaccard ≥ ~0.9 — inside the pinned banding-recall regime) and keeps
    every fresh doc; at sf0.001 the survivor set is exact."""
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    expect = {
        r["doc_id"] + 1000000
        for r in d.filter("doc_id % 4 <> 0").select("doc_id").collect()
    }
    got = {
        r["doc_id"]
        for r in entry_mod.queries()["incremental_dedup_near"](spark, sf).collect()
    }
    assert got == expect
