"""Curate-stage volume rehearsal (VERDICT r5 #8).

The curation chain is golden-checked at fixture scale (cur1 +
tests/test_curate.py), but its VOLUME behavior — the two dedup-keeper
window shuffles, the paragraph-dedup corpus aggregate, and the
LSH-over-survivors stage — deserves an archived stress number next to
the 1.6M-page extraction point in SCALE.md.  This runs the full
``curate=True`` pipeline (paragraph dedup + PII redaction + head-domain
quota + near-dup pairs) over the same deterministic 1.6M-page corpus
and prints one JSON line: wall time, pages/s, and the per-filter drop
counts from the stage manifest.

Usage: python tools/volume_curate.py [n_pages]   (default 1,600,000)
Takes the bench flock (tools/bench_lock.py) — this is a measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    from bench_lock import acquire_bench_lock, foreign_spark_jvms
    from scaling_bench import pregen

    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.plans.pipeline import run_pipeline
    from wikidata_dump_processor_spark.session import get_spark

    lock = acquire_bench_lock()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # memory scales with volume: the curate chain carries text_orig +
    # text + text_redacted per doc through its checkpoint, so the 16g
    # bench default OOMs at 1.6M pages — a cluster sizes executor memory
    # to the per-partition slice the same way
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    pages_path = f"/dev/shm/volume_pages_{n}"
    pregen(n, pages_path)

    scratch = "/dev/shm/volume_curate_scratch"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        "volume-curate", cpus=cpus, shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    foreign = set(foreign_spark_jvms())

    curate_opts = {
        "domain_cap": int(os.environ.get("VOLUME_DOMAIN_CAP", "20000")),
        "pii_redact": True,
        "para_dedup": True,
    }

    # untimed warm-up (JIT/codegen + Python worker pool), 1/50 scale
    wout = tempfile.mkdtemp(prefix="warm_", dir=scratch)
    run_pipeline(
        spark, datagen.gen_pages(spark, max(n // 50, 500)).localCheckpoint(eager=True),
        datagen.gen_aliases(spark), wout, datagen.gen_entity_catalog(spark),
        fingerprint="warmup", curate=True, curate_opts=dict(curate_opts),
    )
    shutil.rmtree(wout, ignore_errors=True)

    pages = spark.read.parquet(pages_path)
    out = tempfile.mkdtemp(prefix="volume_curate_", dir=scratch)
    t0 = time.time()
    res = run_pipeline(
        spark, pages, datagen.gen_aliases(spark), out,
        datagen.gen_entity_catalog(spark),
        fingerprint=f"volume-{n}", curate=True, curate_opts=curate_opts,
    )
    n_triples = res["canonical_triples"].count()
    wall = round(time.time() - t0, 1)
    man = res["manifest"]
    foreign |= set(foreign_spark_jvms())
    report = {
        "n_pages": n,
        "cpus": cpus,
        "wall_s": wall,
        "pages_per_sec": round(n / wall, 1),
        "canonical_triples": n_triples,
        "curate_opts": {k: v for k, v in curate_opts.items()},
        "curate_filters": man.stages["curate"]["metrics"]["filters"],
        "curate_rows": man.stages["curate"]["metrics"].get("rows"),
        "stage_walls": {
            s: round(
                e.get("committed_at", 0) - e.get("started_at", 0), 1
            )
            for s, e in sorted(man.stages.items())
            if e.get("state") == "committed" and e.get("started_at")
        },
        "bench_lock": lock,
        "concurrent_spark_detected": bool(foreign),
        "foreign_spark_pids": sorted(foreign) or None,
    }
    print(json.dumps(report))
    runs_dir = os.path.join(REPO, "BENCH", "runs")
    os.makedirs(runs_dir, exist_ok=True)
    with open(
        os.path.join(runs_dir, f"volume_curate_{int(time.time())}.json"), "w"
    ) as f:
        json.dump(report, f, indent=1)
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
