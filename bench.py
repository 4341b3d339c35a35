"""Benchmark harness: headline queries + the KG-construction pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "triples_per_sec": ..., "pages_per_sec": ..., "reps": R,
   "kg_pipeline_reps": [...], "control": {...}}

Measurement protocol (round-4): this host shows proven ±2-3x
identical-code swings between time windows (BENCH/BASELINE.md A/B
tables), so a single-shot timing is a property of the window, not the
engine.  Every timed section therefore runs BENCH_REPS times (default 3)
and reports the MEDIAN, with all reps archived in the JSON; and a fixed
pure-CPU probe (no Spark, constant work) runs before/between/after the
pipeline reps as the same-window control — a degraded window shows up as
probe times far above the ~1.1 s (1-process) / saturated all-core
baseline, letting any reader normalize the artifact.

Set BENCH_ONLY=kg_pipeline to time only the pipeline and BENCH_REPS=1
for single-shot (used by the scaling harness, tools/scaling_bench.py,
which supplies its own interleaved protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ONLY = os.environ.get("BENCH_ONLY", "")
REPS = int(os.environ.get("BENCH_REPS", "3"))

# headline operator queries (oracle-checked subset, heaviest plans)
HEADLINE = [
    "a1_pricing_summary",
    "j1_region_revenue",
    "a6_top_revenue_parts",
    "w2_running_customer_spend",
    "d1_exact_dedup",
    "d3_wordset_jaccard_pairs",
    "v1_knn_bruteforce",
    "kg8_minhash_near_dups",
    "kg9_simhash_near_dups",
]

_PROBE_ITERS = 20_000_000  # fixed work -> seconds comparable across rounds


def _cpu_probe_1p() -> float:
    """Single-process LCG busy loop over fixed work: wall seconds measure
    this window's per-core speed (no Spark, no allocation, no I/O)."""
    t0 = time.time()
    x = 0
    for _ in range(_PROBE_ITERS // 100_000):
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) % (1 << 31)
    return round(time.time() - t0, 3)


def _cpu_probe_allcore(nproc: int) -> float:
    """All-core probe: nproc processes each doing the SAME fixed work
    (1/8 of the 1-process probe, independent of nproc) — with free cores
    the wall time matches one process's share; it rises when the box's
    scheduler / shared buses are contended (the proven source of the
    ±2-3x window swings)."""
    import multiprocessing as mp

    def burn(iters: int):
        x = 0
        for _ in range(iters // 100_000):
            for _ in range(100_000):
                x = (x * 1103515245 + 12345) % (1 << 31)

    t0 = time.time()
    ps = [
        mp.Process(target=burn, args=(_PROBE_ITERS // 8,))
        for _ in range(nproc)
    ]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return round(time.time() - t0, 3)


def main():
    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.queries_catalog import SPARK_QUERIES
    from wikidata_dump_processor_spark.session import get_spark

    # Stage outputs + shuffle files on tmpfs: on a real cluster both go to
    # storage whose aggregate bandwidth scales with executor count (S3 /
    # HDFS / local SSDs per node); this box's single virtual disk does not
    # scale with cores, so disk writes would serialize the measurement.
    scratch = os.environ.get("BENCH_SCRATCH", "/dev/shm/bench_scratch")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        "bench", cpus=CPUS, shuffle_partitions=max(CPUS, 8),
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    control: dict[str, list[float]] = {"probe_1p_sec": [], "probe_allcore_sec": []}

    def take_control():
        control["probe_1p_sec"].append(_cpu_probe_1p())
        control["probe_allcore_sec"].append(_cpu_probe_allcore(CPUS))

    n_pages = int(os.environ.get("BENCH_KG_PAGES", "0")) or datagen.sf_to_n_pages(SF_DIR)

    # --- KG pipeline: pages -> text -> triples -> canonical graph ---------
    from wikidata_dump_processor_spark.plans.pipeline import run_pipeline

    # Untimed warm-up at 1/50 scale: JIT/codegen + Python-worker pool
    # spin-up are one-time costs a long-running cluster job amortizes;
    # timing them would measure JVM warm-up, not the engine.
    if os.environ.get("BENCH_WARMUP", "1") != "0":
        wout = tempfile.mkdtemp(prefix="bench_kg_warm_", dir=scratch)
        try:
            wp = datagen.gen_pages(spark, max(n_pages // 50, 500)).localCheckpoint(eager=True)
            run_pipeline(
                spark, wp, datagen.gen_aliases(spark), wout,
                datagen.gen_entity_catalog(spark), fingerprint="warmup",
            )["canonical_triples"].count()
        finally:
            shutil.rmtree(wout, ignore_errors=True)

    # BENCH_PAGES_PATH: pre-materialized pages table (parquet) — the
    # realistic input shape (input_hint: an Iceberg/parquet table), and
    # it keeps corpus generation out of every rep.  Fallback: generate
    # in-memory once and checkpoint; every rep reuses the same input.
    pages_path = os.environ.get("BENCH_PAGES_PATH", "")
    if pages_path:
        pages = spark.read.parquet(pages_path)
        n_pages = pages.count()  # parquet metadata, no scan
    else:
        pages = datagen.gen_pages(spark, n_pages).localCheckpoint(eager=True)

    take_control()
    kg_reps: list[float] = []
    n_triples = 0
    for rep in range(REPS):
        out = tempfile.mkdtemp(prefix=f"bench_kg_r{rep}_", dir=scratch)
        res = None
        try:
            t0 = time.time()
            res = run_pipeline(
                spark, pages, datagen.gen_aliases(spark), out,
                datagen.gen_entity_catalog(spark),
                fingerprint=f"bench-{n_pages}-rep{rep}",
            )
            n_triples = res["canonical_triples"].count()
            kg_reps.append(round(time.time() - t0, 3))
        finally:
            # drop the rep's catalog entry (stale registrations must not
            # outlive the rep's files), then the files
            if res is not None:
                tbl = res["manifest"].stages["nodes"]["metrics"].get("table")
                if tbl:
                    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(out, ignore_errors=True)
        take_control()
    kg_sec = statistics.median(kg_reps)
    timings["kg_pipeline"] = round(kg_sec, 3)
    all_reps["kg_pipeline"] = kg_reps

    # --- headline operator queries ----------------------------------------
    if ONLY != "kg_pipeline":
        for name in HEADLINE:
            fn = SPARK_QUERIES[name]
            reps: list[float] = []
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, SF_DIR).count()
                reps.append(round(time.time() - t0, 3))
            timings[name] = round(statistics.median(reps), 3)
            all_reps[name] = reps
        take_control()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end_to_end_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "kg_pages": n_pages,
                "kg_triples": n_triples,
                "pages_per_sec": round(n_pages / kg_sec, 1),
                "triples_per_sec": round(n_triples / kg_sec, 1),
                "reps": REPS,
                "queries_all_reps": all_reps,
                "control": control,
            }
        )
    )


if __name__ == "__main__":
    main()
