#!/usr/bin/env python3
"""N -> 4N scaling evidence for the bucketed seen-set exact confirm.

Same alternating median-of-reps protocol as headline_scaling_protocol.py /
pagerank_scaling.py (fresh local[2]/local[8] JVM per measurement, A/B
alternation so shared-box slow periods hit both levels).  Workload: the
per-round anti-join of a 4M-key probe frontier against a 40M-key seen set
stored as a hash-bucketed table (sources/bucketed.py) — the table build is
setup (untimed, like the Bloom base build), the timed section is only the
join that recurs every crawl round.  Broadcast disabled: the 10^10-key
regime never broadcasts the seen side.

Usage: python scripts/seen_antijoin_scaling.py [reps=3]
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
N_SEEN = 40_000_000
N_PROBE = 4_000_000

from pyspark.sql import functions as F
from bbcrawl_spark.plans.session import build_session
from bbcrawl_spark.sources import bucketed

spark = build_session(app_name=f"antijoin-scaling-{CORES}", cores=CORES)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
parts = max(CORES * 4, 16)

root = tempfile.mkdtemp(prefix=f"aj_scale_{CORES}_")
seen = spark.range(0, N_SEEN, 1, parts).select(
    F.xxhash64("id").alias("url_hash")
)
# setup, untimed: the seen table is written once per crawl epoch, the
# anti-join below is paid every round — buckets fixed across levels so
# both levels read the identical layout
bucketed.write_bucketed(seen, "scale_seen", root + "/seen", 32)

probe = (
    spark.range(N_SEEN - N_PROBE // 2, N_SEEN + N_PROBE // 2, 1, parts)
    .select(F.xxhash64("id").alias("url_hash"))
    .cache()
)
probe.count()

def one() -> int:
    return bucketed.anti_join_new(probe, spark, "scale_seen").count()

assert one() == N_PROBE // 2  # warm + correctness
best = float("inf")
for _ in range(2):
    t0 = time.time()
    n = one()
    best = min(best, time.time() - t0)
spark.stop()
print(json.dumps({"cores": CORES, "antijoin_40m": round(best, 2), "new": n}))
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores)],
        env=dict(os.environ, PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=1800, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: dict[int, list[float]] = {2: [], 8: []}
    for i in range(reps):
        for cores in (2, 8):  # alternate so slow periods hit both levels
            r = run_level(cores)
            runs[cores].append(r["antijoin_40m"])
            print(f"rep {i + 1} local[{cores}]: {r}", file=sys.stderr)
    med = {c: round(statistics.median(runs[c]), 2) for c in (2, 8)}
    print(json.dumps({
        "protocol": f"alternating A/B, median of {reps}, fresh JVM per measurement",
        "workload": "bucketed seen anti-join: 4M probes vs 40M-key bucketed table",
        "median_seconds": {str(c): med[c] for c in (2, 8)},
        "all_seconds": {str(c): runs[c] for c in (2, 8)},
        "efficiency_2_to_8_of_medians": round((med[2] / med[8]) / 4, 3),
    }))


if __name__ == "__main__":
    main()
