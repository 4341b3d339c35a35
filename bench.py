"""Benchmark harness: headline queries + the KG-construction pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "triples_per_sec": ..., "pages_per_sec": ...}

Set BENCH_ONLY=kg_pipeline to time only the pipeline (used by the
scaling harness, tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ONLY = os.environ.get("BENCH_ONLY", "")

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
    n_pages = int(os.environ.get("BENCH_KG_PAGES", "0")) or datagen.sf_to_n_pages(SF_DIR)

    # --- KG pipeline: pages -> text -> triples -> canonical graph ---------
    out = tempfile.mkdtemp(prefix="bench_kg_", dir=scratch)
    try:
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
        # it keeps corpus generation out of every scaling rep.  Fallback:
        # generate in-memory and checkpoint.
        pages_path = os.environ.get("BENCH_PAGES_PATH", "")
        if pages_path:
            pages = spark.read.parquet(pages_path)
            n_pages = pages.count()  # parquet metadata, no scan
        else:
            pages = datagen.gen_pages(spark, n_pages).localCheckpoint(eager=True)
        t0 = time.time()
        res = run_pipeline(
            spark, pages, datagen.gen_aliases(spark), out,
            datagen.gen_entity_catalog(spark), fingerprint=f"bench-{n_pages}",
        )
        n_triples = res["canonical_triples"].count()
        kg_sec = time.time() - t0
        timings["kg_pipeline"] = round(kg_sec, 3)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # --- headline operator queries ----------------------------------------
    if ONLY != "kg_pipeline":
        for name in HEADLINE:
            fn = SPARK_QUERIES[name]
            t0 = time.time()
            fn(spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)

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
            }
        )
    )


if __name__ == "__main__":
    main()
