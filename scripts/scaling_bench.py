#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-executor cluster exists in this sandbox; per the driver note
the N -> 4N executor criterion is evidenced by running the same jobs on the
same input at two parallelism levels. This script measures the engine's
core stages warm (first run warms JVM/python workers, second run is timed)
at local[2], local[8] and local[32] and reports BOTH 4x pairs:

* 2 -> 8 cores: both levels sit below the single-box memory-bandwidth
  wall, so this pair measures the ENGINE's parallel efficiency — the
  analogue of adding executors to a cluster (each executor brings its own
  memory bus).
* 8 -> 32 cores: on one box, all 32 threads share one memory bus; the
  shuffle/sort stages saturate bandwidth around 8 cores. Reported with
  that analysis — on a real 4N-executor cluster aggregate bandwidth grows
  with N, which is exactly why the engine minimizes shuffles (map-side
  Bloom, broadcast gates, WindowGroupLimit partial limits).

Writes BENCH.md, prints one summary JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_scaling_worker.py")


def run_at(cores: int) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, WORKER, str(cores)],
        env=env, capture_output=True, text=True, timeout=2400, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def build_summary(results: dict) -> dict:
    levels = sorted(results)

    def eff(pair, q):
        a, b = pair
        return round((results[a]["timings"][q] / results[b]["timings"][q]) / (b / a), 3)

    queries = list(results[levels[0]]["timings"])
    pairs = [(2, 8), (8, 32)]
    summary = {
        "levels": levels,
        "timings": {c: results[c]["timings"] for c in levels},
        "throughput": {c: results[c]["throughput"] for c in levels},
        "exchange_bytes": {c: results[c].get("exchange_bytes", {}) for c in levels},
        "efficiency": {
            f"{a}->{b}": {q: eff((a, b), q) for q in queries} for a, b in pairs
        },
    }
    # HEADLINE = the workload-shaped stage in the engine's CONFIGURED scale
    # shape (crawl_pipeline_bloom: map-side Bloom prune -> anti-join confirm
    # -> single-pass politeness, BOTH output sides materialized) — the stage
    # closest to the north-rule metric (URLs scheduled+fetched/sec). The
    # bloom-less variant and the compute-stage average are reported in the
    # same table; a headline that averages the workload stage away is not
    # evidence.
    summary["headline_efficiency_2_to_8"] = summary["efficiency"]["2->8"][
        "crawl_pipeline_bloom"
    ]
    core_qs = ["canonicalize_hash", "extract_pages", "frontier_gen"]
    summary["compute_stage_efficiency_2_to_8"] = round(
        sum(summary["efficiency"]["2->8"][q] for q in core_qs) / len(core_qs), 3
    )
    return summary


def render(summary: dict) -> str:
    queries = list(summary["timings"][2])
    lines = [
        "# BENCH — throughput + N->4N scaling evidence",
        "",
        "The north_rule's two-cluster-size criterion (N vs 4N executors,",
        "efficiency >= 0.8) cannot use a real cluster in this sandbox; per the",
        "driver note it is evidenced by running the same jobs on the same input",
        "at two parallelism levels. Warm measurements (2nd run timed) at",
        "local[2], local[8], local[32]; efficiency = (T_N / T_4N) / 4.",
        "",
        f"**Headline (N=2 -> 4N=8 cores, crawl_pipeline_bloom — the "
        f"north-rule workload stage in the engine's configured scale shape: "
        f"map-side Bloom prune -> exact anti-join confirm -> single-pass "
        f"politeness, both scheduled AND deferred sides materialized): "
        f"efficiency **{summary['headline_efficiency_2_to_8']}** "
        f"(target >= 0.8). Bloom-less pipeline: "
        f"{summary['efficiency']['2->8']['crawl_pipeline']}; compute-stage "
        f"average: {summary['compute_stage_efficiency_2_to_8']}.**",
        "",
        "| stage | T@2c (s) | T@8c (s) | T@32c (s) | eff 2->8 | eff 8->32 |",
        "|---|---|---|---|---|---|",
    ]
    tm = summary["timings"]
    for q in queries:
        lines.append(
            f"| {q} | {tm[2][q]} | {tm[8][q]} | "
            f"{tm[32][q]} | {summary['efficiency']['2->8'][q]} | "
            f"{summary['efficiency']['8->32'][q]} |"
        )
    lines += [
        "",
        "Throughput at each level:",
        "",
        "| metric | @2c | @8c | @32c |",
        "|---|---|---|---|",
    ]
    tp = summary["throughput"]
    for m in tp[2]:
        lines.append(
            f"| {m} | {tp[2][m]:,.0f} | "
            f"{tp[8][m]:,.0f} | {tp[32][m]:,.0f} |"
        )
    xb = summary["exchange_bytes"]
    if xb.get(32):
        lines += [
            "",
            "Measured exchange payload (shuffle bytes written per run, from the",
            "status REST API) per level — the direct evidence for what each",
            "plan pushes through its exchanges:",
            "",
            "| stage | bytes @2c | bytes @8c | bytes @32c |",
            "|---|---|---|---|",
        ]
        for q in xb[32]:
            lines.append(
                f"| {q} | {xb[2].get(q, 0):,} | {xb[8].get(q, 0):,} | {xb[32][q]:,} |"
            )
        wide, narrow = xb[32].get("crawl_pipeline"), xb[32].get("crawl_pipeline_bcast")
        if wide and narrow:
            if narrow < 0.8 * wide:
                lines += [
                    "",
                    f"broadcast_topk moves **{wide / narrow:.1f}x fewer bytes** "
                    "through the exchange than the full-row single-pass rank "
                    "(the wide frontier never shuffles; only the narrow "
                    "projection's WindowGroupLimit survivors do).",
                ]
            else:
                lines += [
                    "",
                    f"**Negative result, reported honestly:** broadcast_topk "
                    f"moves {narrow:,} bytes vs single_pass's {wide:,} on THIS "
                    "synthetic — no saving. The dominant exchange here is the "
                    "seen ANTI-JOIN (shared by every mode), and the 'narrow' "
                    "rank projection only drops the `url` column because the "
                    "synthetic frontier carries little else; with 997 hosts x "
                    "budget 50 x ~128 mappers, WindowGroupLimit's partial "
                    "phase also barely limits. The mode still wins when "
                    "frontier rows are wide (real crawls carry seed/discovery "
                    "metadata) and hosts >> budget x mappers; the plan shape "
                    "is pinned in tests either way "
                    "(test_broadcast_topk_plan_never_shuffles_frontier).",
                ]
        cp = {c: xb[c].get("crawl_pipeline") for c in (2, 8, 32) if xb.get(c)}
        t = summary["timings"]
        if len(cp) == 3 and all(cp.values()):
            spread = max(cp.values()) / min(cp.values())
            lines += [
                "",
                "**What pins the 8->32 ceiling on the bus, not the plan:** the "
                f"pipeline's exchange payload is FLAT across levels "
                f"({cp[2]:,} / {cp[8]:,} / {cp[32]:,} bytes at 2/8/32c — "
                f"{spread:.2f}x spread), i.e. the physical plan does identical "
                "work at every parallelism, yet wall time improves 2->8 "
                f"({t[2]['crawl_pipeline']}s -> {t[8]['crawl_pipeline']}s) and "
                f"regresses 8->32 ({t[8]['crawl_pipeline']}s -> "
                f"{t[32]['crawl_pipeline']}s). Same plan + same bytes + 4x "
                "threads = slower is a shared-memory-bus/allocator contention "
                "signature, not a Spark plan defect; executors on a real "
                "cluster each bring their own bus, which is the regime the "
                "2->8 pair emulates.",
            ]
    lines += [
        "",
        "## Why 8 -> 32 flattens on one box",
        "",
        "local[32] shares ONE memory bus across all task threads; the",
        "sort/shuffle stages (politeness windows, anti-join exchanges) are",
        "memory-bandwidth-bound and saturate near 8 cores, so wall-clock stops",
        "improving even though CPU-bound stages (regex canonicalization, HTML",
        "extraction in Arrow-batched python workers) keep scaling. A real",
        "cluster adds a memory bus and NICs with every executor — the regime",
        "the 2->8 pair emulates. The engine's shuffle-minimizing design",
        "(map-side partitioned Bloom with incremental delta maintenance,",
        "broadcast robots/exclude gates, single-pass flag-style politeness —",
        "one exchange, no complement anti-join — and AQE) exists precisely",
        "to keep the scale-limiting exchanges small at 10^10-URL scale.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(summary, indent=1),
        "```",
    ]
    return "\n".join(lines) + "\n"


def _intkey(d):
    return {int(k) if str(k).isdigit() else k: v for k, v in d.items()}


def main() -> None:
    if "--rerender" in sys.argv:
        # re-render BENCH.md from its own raw-JSON tail (no Spark runs) —
        # for iterating on the analysis text after an expensive measurement
        tail = open(os.path.join(REPO, "BENCH.md")).read()
        summary = json.loads(tail.rsplit("```json", 1)[1].split("```")[0])
        for key in ("timings", "throughput", "exchange_bytes"):
            summary[key] = _intkey(summary[key])
    else:
        results = {c: run_at(c) for c in [2, 8, 32]}
        summary = build_summary(results)
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(render(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
