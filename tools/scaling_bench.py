"""Two-parallelism scaling run (the sandbox stand-in for N vs 4N executor
clusters): run the identical KG pipeline on the identical input at
local[8] and local[32] in fresh JVMs, report throughput at both and the
scaling efficiency eff = throughput_32 / (4 * throughput_8) into
BENCH/BASELINE.md (BASELINE.json north_rule: eff >= 0.8).

Usage: python tools/scaling_bench.py [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY="kg_pipeline",
        BENCH_KG_PAGES=os.environ.get("SCALING_N", "400000"),
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {8: [], 32: []}
    for _ in range(repeats):
        for cpus in (8, 32):
            r = run_once(cpus)
            results[cpus].append(r)
            print(f"local[{cpus}]: {r['queries']['kg_pipeline']}s, "
                  f"{r['pages_per_sec']} pages/s, {r['triples_per_sec']} triples/s")

    best = {c: max(results[c], key=lambda r: r["pages_per_sec"]) for c in (8, 32)}
    tput8, tput32 = best[8]["pages_per_sec"], best[32]["pages_per_sec"]
    eff = tput32 / (4 * tput8)
    md = f"""# BENCH/BASELINE — scaling evidence ({time.strftime('%Y-%m-%d %H:%M')})

Identical job (KG pipeline: datagen-checkpointed pages -> byte-identical
text extraction -> triple extraction -> mention linking -> CC
canonicalization -> materialized graph) on identical input
({best[8]['kg_pages']} pages, sf={best[8]['sf']}), two parallelism levels
standing in for N vs 4N executors (BASELINE.md criterion).

| parallelism | wall (s) | pages/s | triples/s |
|---|---|---|---|
| local[8]  (N)  | {best[8]['queries']['kg_pipeline']} | {tput8} | {best[8]['triples_per_sec']} |
| local[32] (4N) | {best[32]['queries']['kg_pipeline']} | {tput32} | {best[32]['triples_per_sec']} |

**Scaling efficiency** eff = throughput_4N / (4 x throughput_N) =
{tput32} / (4 x {tput8}) = **{eff:.3f}** (target >= 0.8).

Reference anchor: the reference processes ~278 items/s on one core
(wdq1.pl:26); see BASELINE.md.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
