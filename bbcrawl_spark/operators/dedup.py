"""Seen-set dedup: partitioned Bloom prefilter + exact anti-join confirm.

The reference dedups by checking whether the output file already exists
before each GET (``/root/reference/libcrawl/download/downloader.go:103-115,
267-273``) — an O(1) point lookup against local disk.  At 10^10-URL frontier
scale the Spark-native equivalent is:

1. a **persistent partitioned Bloom filter** over the seen set
   (``url_hash``-keyed, P fixed partitions, blobs on shared storage) applied
   *map-side* via ``mapInPandas`` — no shuffle, prunes the overwhelmingly
   common "definitely new" case;
2. an **exact left_anti join** against the seen table for the small
   "maybe seen" remainder — Bloom filters have no false negatives, so the
   combination is exact.

Why map-side: a naive ``frontier LEFT ANTI JOIN seen`` shuffles *both*
sides every round; the Bloom pass reduces the frontier side to its
maybe-seen fraction (≈ fpp of new URLs + genuinely-seen URLs) before any
exchange happens.  Spark's own runtime bloom pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) is a bonus on the
anti-join itself, not a replacement: ours is *application state* that
persists across rounds and survives restarts.

Blobs are stored one file per partition under a directory (local in the
sandbox; DBFS/S3/HDFS on a cluster) and lazily loaded + LRU-cached per
executor process, so each task touches only the partitions its rows hash
into.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

__all__ = ["BloomSpec", "build_partitioned_bloom", "bloom_maybe_seen", "dedup_against_seen"]

_NUM_HASHES = 7  # with 10 bits/key -> ~0.8% false-positive rate


class BloomSpec:
    """Sizing + addressing for one partition's Bloom blob."""

    def __init__(self, path: str, num_partitions: int, num_hashes: int = _NUM_HASHES):
        self.path = path
        self.num_partitions = num_partitions
        self.num_hashes = num_hashes

    def blob_path(self, pid: int) -> str:
        return os.path.join(self.path, f"bloom_{pid:05d}.npy")


def _bloom_positions(hashes: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """k double-hashed bit positions per key. hashes: uint64 array."""
    h1 = hashes
    h2 = (hashes >> np.uint64(33)) | (hashes << np.uint64(31))  # wraps, fine
    h2 = h2 | np.uint64(1)  # odd -> full cycle
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def _build_blob(hashes: np.ndarray, bits_per_key: int, k: int) -> np.ndarray:
    n = max(len(hashes), 1)
    m_bits = 1 << max(6, math.ceil(math.log2(n * bits_per_key)))
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    u = hashes.astype(np.uint64)
    for pos in _bloom_positions(u, m_bits, k):
        np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def _check_blob(hashes: np.ndarray, bitmap: np.ndarray, k: int) -> np.ndarray:
    m_bits = len(bitmap) * 8
    out = np.ones(len(hashes), dtype=bool)
    u = hashes.astype(np.uint64)
    for pos in _bloom_positions(u, m_bits, k):
        out &= (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    return out


def build_partitioned_bloom(
    seen: DataFrame,
    path: str,
    num_partitions: int,
    bits_per_key: int = 10,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Build P Bloom blobs from the seen table via grouped applyInPandas —
    Spark's partial-build pattern: each group (= bloom partition) is built
    by whichever executor owns it, written straight to ``path``.

    Returns the manifest DataFrame ``(partition_id int, n_items long,
    m_bits long)`` (already materialized; the write happens inside the
    grouped UDF).
    """
    os.makedirs(path, exist_ok=True)
    spec = BloomSpec(path, num_partitions)
    k = spec.num_hashes

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["_bloom_pid"].iloc[0])
        hashes = pdf[hash_col].to_numpy(dtype=np.int64)
        bitmap = _build_blob(hashes, bits_per_key, k)
        np.save(spec.blob_path(pid), bitmap)
        return pd.DataFrame(
            {"partition_id": [pid], "n_items": [len(hashes)], "m_bits": [len(bitmap) * 8]}
        )

    manifest = (
        seen.select(hash_col)
        .withColumn("_bloom_pid", F.pmod(F.col(hash_col), F.lit(num_partitions)).cast("int"))
        .groupBy("_bloom_pid")
        .applyInPandas(_build, "partition_id int, n_items long, m_bits long")
    )
    # materialize so the blobs exist before anyone reads them
    manifest = manifest.cache()
    manifest.count()
    return manifest


def bloom_maybe_seen(df: DataFrame, spec: BloomSpec, hash_col: str = "url_hash") -> DataFrame:
    """Add ``maybe_seen: boolean`` map-side (mapInPandas, zero shuffle).

    False means *definitely not seen* (Bloom has no false negatives);
    True must be confirmed by the exact anti-join.
    """
    path, P, k = spec.path, spec.num_partitions, spec.num_hashes
    fields = df.schema.fieldNames()
    # NB: df.schema.add() would mutate the DataFrame's cached schema object
    out_schema = StructType(list(df.schema.fields) + [StructField("maybe_seen", BooleanType())])

    def _filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        @lru_cache(maxsize=64)
        def load(pid: int):
            p = os.path.join(path, f"bloom_{pid:05d}.npy")
            return np.load(p) if os.path.exists(p) else None

        for pdf in batches:
            hashes = pdf[hash_col].to_numpy(dtype=np.int64)
            pids = (hashes % P + P) % P  # pmod parity with Spark
            maybe = np.zeros(len(pdf), dtype=bool)
            for pid in np.unique(pids):
                blob = load(int(pid))
                if blob is None:
                    continue  # empty partition -> nothing seen there
                sel = pids == pid
                maybe[sel] = _check_blob(hashes[sel], blob, k)
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    return df.mapInPandas(_filter, out_schema).select(*fields, "maybe_seen")


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: BloomSpec | None = None,
    hash_col: str = "url_hash",
) -> DataFrame:
    """P2/J1: rows of ``candidates`` whose ``url_hash`` is NOT in ``seen``.

    With a Bloom spec, only the maybe-seen fraction reaches the anti-join
    shuffle; definitely-new rows pass through map-side. Exactness is
    preserved (no false negatives + exact confirm).
    """
    if bloom is None:
        return candidates.join(seen.select(hash_col), on=hash_col, how="left_anti")
    flagged = bloom_maybe_seen(candidates, bloom, hash_col)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen.select(hash_col), on=hash_col, how="left_anti")
    return definitely_new.unionByName(confirmed_new)


def union_seen(seen: DataFrame, newly_fetched: DataFrame, hash_col: str = "url_hash") -> DataFrame:
    """A6: seen ∪ new, exact-once on url_hash."""
    return (
        seen.select(hash_col)
        .unionByName(newly_fetched.select(hash_col))
        .dropDuplicates([hash_col])
    )
