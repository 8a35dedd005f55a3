#!/usr/bin/env python3
"""Median-of-3 ALTERNATING scaling protocol for the headline stage.

The full scaling_bench sweep measures each parallelism level once, ~25
minutes apart — on a shared box a slow period during either level skews the
2->8 efficiency in either direction (observed same-day headline spread
0.716 / 1.065 around r4's 0.873). This protocol de-correlates that noise:
it measures ONLY the north-rule workload stage (crawl_pipeline_bloom: map-
side Bloom prune -> exact anti-join confirm -> single-pass politeness, both
sides materialized) plus the bloom-less pipeline, in an A/B/A/B/A/B
alternation of fresh local[2]/local[8] JVMs, and reports per-level MEDIANS
and the efficiency of the medians.

Usage: python scripts/headline_scaling_protocol.py [reps=3]
Prints one JSON line; paste the numbers into BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, tempfile, time

CORES = int(sys.argv[1])
N_PIPELINE = 12_000_000

from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from bbcrawl_spark.operators import dedup, politeness
from bbcrawl_spark.plans.session import build_session

spark = build_session(app_name=f"headline-{CORES}", cores=CORES)
spark.range(0, 256, 1, 64).select(
    F.pandas_udf(lambda s: s, LongType())("id")
).count()  # warm python workers
parts = max(CORES * 4, 32)

urls = (
    spark.range(0, N_PIPELINE, 1, parts)
    .select(
        F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
                 F.lit(".ex/t/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 997).cast("string").alias("host"),
        F.lit(1).alias("priority"),
        (F.col("id") % 100).cast("int").alias("page_num"),
    )
    .withColumn("url_hash", F.xxhash64("url"))
).cache()
urls.count()
seen = urls.filter("url_hash % 3 = 0").select("url_hash").cache()
seen.count()
bdir = tempfile.mkdtemp(prefix=f"headline_bloom_{CORES}_")
dedup.build_partitioned_bloom(seen, bdir, num_partitions=32)
spec_b = dedup.BloomSpec(bdir, 32)

def pipe_bloom():
    bc = []
    row = (politeness.rank_fetch_slots(
        dedup.dedup_against_seen(urls, seen, spec_b, cache=bc), budget=50)
        .agg(F.sum("fetch_rank"), F.sum(F.col("scheduled").cast("long")), F.count("*"))
        .first())
    for df in bc:
        df.unpersist()
    return row

def pipe():
    return (politeness.rank_fetch_slots(
        dedup.dedup_against_seen(urls, seen), budget=50)
        .agg(F.sum("fetch_rank"), F.sum(F.col("scheduled").cast("long")), F.count("*"))
        .first())

timings = {}
for name, fn in (("crawl_pipeline_bloom", pipe_bloom), ("crawl_pipeline", pipe)):
    fn()  # warm (JIT, bloom blob cache)
    best = float("inf")
    for _ in range(2):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    timings[name] = round(best, 2)
spark.stop()
print(json.dumps({"cores": CORES, "timings": timings}))
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores)],
        env=dict(os.environ, PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=1200, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: dict[int, list[dict]] = {2: [], 8: []}
    for i in range(reps):
        for cores in (2, 8):  # alternate so slow periods hit both levels
            t = run_level(cores)["timings"]
            runs[cores].append(t)
            print(f"rep {i + 1} local[{cores}]: {t}", file=sys.stderr)
    stages = list(runs[2][0])
    med = {
        c: {q: round(statistics.median(r[q] for r in runs[c]), 2) for q in stages}
        for c in (2, 8)
    }
    summary = {
        "protocol": f"alternating A/B, median of {reps}, fresh JVM per measurement",
        "median_timings": {str(c): med[c] for c in (2, 8)},
        "all_timings": {str(c): runs[c] for c in (2, 8)},
        "efficiency_2_to_8_of_medians": {
            q: round((med[2][q] / med[8][q]) / 4, 3) for q in stages
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
