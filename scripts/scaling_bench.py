#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-executor cluster exists in this sandbox, so the N -> 4N
executor criterion is evidenced as specified by the driver note: the same
bench.py workload on the same input at local[8] vs local[32], reporting
throughput at both plus scaling efficiency

    eff = (T_8cores / T_32cores) / 4        (1.0 = perfect linear)

Writes BENCH.md and prints the summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_small, n_big = 8, 32
    small = run_bench(n_small)
    big = run_bench(n_big)
    rows = []
    for q in big["queries"]:
        t8, t32 = small["queries"][q], big["queries"][q]
        eff = (t8 / t32) / (n_big / n_small)
        rows.append((q, t8, t32, round(eff, 3)))
    total_eff = (small["value"] / big["value"]) / (n_big / n_small)
    summary = {
        "sf": big["sf"],
        "cores_small": n_small,
        "cores_big": n_big,
        "total_sec_small": small["value"],
        "total_sec_big": big["value"],
        "scaling_efficiency": round(total_eff, 3),
        "urls_per_sec_small": small["urls_per_sec"],
        "urls_per_sec_big": big["urls_per_sec"],
        "urls_per_sec_scaling_efficiency": round(
            (big["urls_per_sec"] / small["urls_per_sec"]) / (n_big / n_small), 3
        ),
        "queries": {q: {"t_8": t8, "t_32": t32, "efficiency": e} for q, t8, t32, e in rows},
    }

    lines = [
        "# BENCH — throughput + N->4N scaling evidence",
        "",
        "The north_rule's two-cluster-size criterion (N vs 4N executors,",
        "efficiency >= 0.8) cannot use a real cluster in this sandbox; per the",
        "driver note it is evidenced by running the identical bench.py workload",
        f"on the identical input ({big['sf']}) at `local[{n_small}]` vs",
        f"`local[{n_big}]`. Efficiency = (T_{n_small} / T_{n_big}) / {n_big // n_small}.",
        "",
        f"**Headline: total {small['value']}s @ {n_small} cores -> "
        f"{big['value']}s @ {n_big} cores; scaling efficiency "
        f"**{summary['scaling_efficiency']}** (target >= 0.8).**",
        "",
        f"Frontier URLs scheduled/sec (crawl_pipeline): "
        f"{small['urls_per_sec']:.0f} @ {n_small}c -> {big['urls_per_sec']:.0f} @ {n_big}c "
        f"(efficiency {summary['urls_per_sec_scaling_efficiency']}).",
        "",
        "| query | T_8 (s) | T_32 (s) | efficiency |",
        "|---|---|---|---|",
    ]
    for q, t8, t32, e in rows:
        lines.append(f"| {q} | {t8} | {t32} | {e} |")
    lines += [
        "",
        "Extraction throughput (pages/sec): "
        f"{small.get('extract_pages_per_sec')} @ {n_small}c -> "
        f"{big.get('extract_pages_per_sec')} @ {n_big}c.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(summary, indent=1),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
