"""Hash-bucketed seen-set storage: a per-round anti-join that never
re-shuffles the 10^10-row side.

The seen set is the crawl's largest state — at the north-rule's 10^10-URL
frontier it is ~10^10 ``url_hash`` keys, growing every round.  The Bloom
prefilter (operators/dedup.py) removes the *definitely new* URLs map-side,
but the exact left-anti confirm still has to co-locate the maybe-seen
frontier rows with the seen rows, and a plain parquet seen table makes
Spark shuffle BOTH sides of that join on every round: the 10^10-row seen
side crosses the exchange again and again to answer questions about a
10^6-row remainder.

This module stores the seen set as a **hash-bucketed table** (Spark's
native parquet bucketing: ``CLUSTERED BY (url_hash) INTO n BUCKETS``).  A
bucketed scan reports ``HashPartitioning(url_hash, n)`` to the planner, so
the anti-join's distribution requirement is already satisfied on the seen
side — the executed plan carries exactly ONE exchange, on the (small)
frontier side, and the seen table is read in place, forever
(pinned in tests/test_bucketed.py).  Appending a round's newly-seen keys
writes only delta files into the same bucket layout (maintenance ∝ |new|,
the same contract as the incremental Bloom), and a single-key probe prunes
to 1/n of the files (``SelectedBucketsCount: 1 out of n``) — the
distributed analogue of the reference's O(1) per-URL ``Exists()`` check
(``/root/reference/libcrawl/download/downloader.go:103-115, 267-273``).

Sandbox vs cluster: Spark's bucketing metadata lives in the session
catalog, so :func:`register_bucketed` re-attaches the on-disk table after
a restart with one ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` DDL —
the tables are written as EXTERNAL (``option("path")``), so data files
outlive any catalog entry.  On a real cluster the same design is Iceberg's
``bucket(n, url_hash)`` partition transform + storage-partitioned joins;
like sources/warehouse.py, this is the declared sandbox fallback with the
identical four-call surface (write / append / register / anti-join).

The same mechanism serves the OTHER dominant per-round shuffle: a frontier
persisted bucketed by ``host`` feeds ``politeness.rank_fetch_slots`` with
ZERO exchanges — the window's required distribution is satisfied by the
bucketed scan (pinned in tests/test_bucketed.py).  Bucket any table on the
key its recurring window/join partitions by, and that exchange is paid
once at write time instead of on every read.

Sizing: buckets are the unit of join parallelism AND of the file fan-out —
at 10^10 keys (~80 GB of hashes) 4096 buckets keep each bucket ~20 MB of
key data while matching a large cluster's core count.  Bucket files
accumulate one-per-task-per-append; :func:`compact_bucketed` rewrites the
table into a fresh location (one file per bucket per writer wave) when the
file count, not the data, becomes the scan cost — same rationale as
``Warehouse.compact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_bucketed",
    "append_bucketed",
    "register_bucketed",
    "anti_join_new",
    "compact_bucketed",
]


def _writer(df: DataFrame, path: str, buckets: int, key: str):
    return (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
    )


def write_bucketed(
    df: DataFrame, table: str, path: str, buckets: int, key: str = "url_hash"
) -> None:
    """Create (or replace) ``table`` as an EXTERNAL parquet table at
    ``path``, hash-bucketed and sorted on ``key``.  Rows are clustered by
    ``murmur3(key) % buckets`` at write time so every later equi-join or
    point probe on ``key`` reads the table without an exchange."""
    _writer(df, path, buckets, key).mode("overwrite").saveAsTable(table)


def append_bucketed(
    df: DataFrame, table: str, path: str, buckets: int, key: str = "url_hash"
) -> None:
    """Append a delta (e.g. this round's newly-seen ``url_hash`` keys) into
    the existing bucket layout.  Only |delta| rows are written — existing
    bucket files are untouched, so per-round maintenance cost is
    proportional to the round's new URLs, not the 10^10-row total."""
    _writer(df, path, buckets, key).mode("append").saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    buckets: int,
    schema_ddl: str,
    key: str = "url_hash",
) -> None:
    """Re-attach an on-disk bucketed table after a session/catalog restart.

    ``schema_ddl`` is the column list (e.g. ``"url_hash BIGINT"``).  The
    DDL recreates only metadata — no data is read or moved — restoring the
    bucketed-scan property for all subsequent joins; resume paths call this
    before the first round's anti-join (the catalog is per-session, the
    files are forever)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def anti_join_new(
    frontier: DataFrame, spark: SparkSession, table: str, key: str = "url_hash"
) -> DataFrame:
    """Frontier rows whose ``key`` is NOT in the bucketed seen table.

    The seen side is ``spark.table(table)`` — the catalog's bucketed scan,
    NOT a plain ``read.parquet`` of the same directory (that would lose the
    bucketing metadata and reintroduce the 10^10-row exchange).  The plan
    contract (one exchange, frontier side only; ``Bucketed: true`` on the
    seen scan) is pinned in tests/test_bucketed.py."""
    return frontier.join(spark.table(table), key, "left_anti")


def compact_bucketed(
    spark: SparkSession,
    table: str,
    new_path: str,
    buckets: int,
    key: str = "url_hash",
) -> None:
    """Rewrite the table's accumulated per-append bucket files into a fresh
    location and re-point the catalog entry at it.

    A new location (not in-place) because Spark cannot overwrite a path it
    is reading from; the caller deletes the old directory once the swap
    lands — crash-safe in the same invisible-garbage sense as
    ``Warehouse.compact`` (an interrupted compaction leaves the catalog on
    the old, complete location)."""
    cur = spark.table(table)
    schema_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cur.schema.fields)
    _writer(cur, new_path, buckets, key).mode("overwrite").saveAsTable(f"{table}__compact")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compact")
    register_bucketed(spark, table, new_path, buckets, schema_ddl, key)
