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

Round-6 exclusivity guard (tools/bench_lock.py): the run takes an
flock (aborts loudly if another bench job holds it; children inherit
via BENCH_LOCK_HELD), and a /proc sweep for foreign Spark JVMs runs at
every control point — the artifact carries
``concurrent_spark_detected`` / ``foreign_spark_pids`` so a
contaminated window excludes itself instead of by hand (round-5 run S).

Round-5 addition: unless BENCH_WEAK_WINDOW=0, the artifact also carries
paired weak-scaling windows (the criterion-evidence formulation from
SCALE.md / BENCH/BASELINE.md: data and cores grow together, N cores @
n/4 pages vs 4N cores @ n pages, run back-to-back in fresh JVMs so
window-scale host drift cancels inside the ratio).  ``weak_eff_paired``
is the MEDIAN over ``BENCH_WEAK_WINDOWS`` (default 3) such windows —
one window on this host is a coin flip (0.275 and 1.615 measured
back-to-back at the same HEAD); the median matches the documented
paired-window-median protocol with no one-sided retry bias.  Each
window carries a same-window pure-CPU scale control, raw JSON under
BENCH/runs/ — the round artifact alone evidences the >= 0.8 scaling
criterion.

Window protocol (must match the harness's criterion conditions, or the
number is noise — a first single-cold-rep 2→8 variant measured 0.275
and 1.615 in back-to-back windows):
* levels default 1→4 (``BENCH_WEAK_LEVELS``) — the pair BELOW this
  box's memory-bus saturation region, the formulation SCALE.md names
  as criterion evidence (run M: 0.978); 2→8 shares one bandwidth
  domain at the hi level and measures the bus, not the engine;
* each child JVM runs ``BENCH_WEAK_REPS`` (default 3) reps and reports
  the median — i.e. a WARM rep; a single cold rep mixes JIT/codegen
  warm-up (a fixed cost, relatively larger at the small lo scale) into
  the ratio.
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


def _cpu_scale_control(lo: int, hi: int, secs: float = 6.0) -> float:
    """Pure-CPU scale control for the weak window: throughput of hi vs lo
    busy-loop processes; 1.0 = the box itself scales cleanly lo->hi."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        x = n = 0
        while time.time() - t0 < secs:
            for _ in range(100_000):
                x = (x * 1103515245 + 12345) % (1 << 31)
            n += 100_000
        q.put(n)

    tput = {}
    for k in (lo, hi):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(k)]
        [p.start() for p in ps]
        tput[k] = sum(q.get() for _ in ps) / secs
        [p.join() for p in ps]
    return round(tput[hi] / ((hi / lo) * tput[lo]), 3)


def _weak_window(scratch: str) -> dict | None:
    """One paired weak-scaling window in fresh JVMs: local[lo] @ n/4
    pages, then local[hi] @ n pages, back-to-back.  Returns the raw
    window dict (also archived under BENCH/runs/) or None on failure —
    the bench line must print either way."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    lo, hi = (int(x) for x in os.environ.get("BENCH_WEAK_LEVELS", "1,4").split(","))
    n = int(os.environ.get("BENCH_WEAK_PAGES", "0")) or 100_000
    reps = os.environ.get("BENCH_WEAK_REPS", "3")
    paths = {}
    for label, rows in (("small", n // (hi // lo)), ("full", n)):
        paths[label] = os.path.join(scratch, f"weak_pages_{label}")

    def run_once(cpus: int, pages_path: str) -> dict:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            BENCH_ONLY="kg_pipeline",
            BENCH_REPS=reps,  # median over reps = a WARM rep (see docstring)
            BENCH_WEAK_WINDOW="0",  # no recursion
            BENCH_PAGES_PATH=pages_path,
            BENCH_SCRATCH=scratch,
        )
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=repo, env=env,
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    try:
        ctl_before = _cpu_scale_control(lo, hi)
        r_lo = run_once(lo, paths["small"])
        r_hi = run_once(hi, paths["full"])
        ctl_after = _cpu_scale_control(lo, hi)
        eff = round(
            r_hi["pages_per_sec"] / ((hi / lo) * r_lo["pages_per_sec"]), 3
        )
        window = {
            "levels": [lo, hi],
            "pages": [n // (hi // lo), n],
            "lo_pps": r_lo["pages_per_sec"],
            "hi_pps": r_hi["pages_per_sec"],
            "lo_wall_s": r_lo["queries"]["kg_pipeline"],
            "hi_wall_s": r_hi["queries"]["kg_pipeline"],
            "weak_eff_paired": eff,
            "cpu_control_eff": [ctl_before, ctl_after],
        }
        runs_dir = os.path.join(repo, "BENCH", "runs")
        os.makedirs(runs_dir, exist_ok=True)
        with open(
            os.path.join(runs_dir, f"weak_window_{int(time.time())}.json"), "w"
        ) as f:
            json.dump(window, f, indent=1)
        return window
    except Exception as e:  # noqa: BLE001 — bench line must still print
        print(f"weak window failed: {e}", file=sys.stderr)
        return None


def main():
    from tools.bench_lock import acquire_bench_lock, foreign_spark_jvms

    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.queries_catalog import SPARK_QUERIES
    from wikidata_dump_processor_spark.session import get_spark

    # exclusivity guard (round-5 run S had to be hand-excluded): abort
    # loudly if another bench holds the lock, and sweep for foreign
    # Spark JVMs at every control point so the artifact carries its own
    # contamination verdict
    bench_lock = acquire_bench_lock()
    foreign: set[int] = set(foreign_spark_jvms())

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
        foreign.update(foreign_spark_jvms())

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

    # --- paired weak-scaling windows (fresh JVMs; main session stopped) ---
    # The criterion estimator is the MEDIAN over BENCH_WEAK_WINDOWS
    # (default 3) paired windows: a single window on this host is a coin
    # flip (same-HEAD windows have measured 0.275 and 1.615 back-to-back,
    # BENCH/runs/), while the median of 3 is the same unbiased
    # paired-window-median protocol SCALE.md documents — no one-sided
    # retry/best-of softening (the ADVICE r4 finding on scaling_bench).
    weak, weak_all = None, []
    if ONLY != "kg_pipeline" and os.environ.get("BENCH_WEAK_WINDOW", "1") != "0":
        lo, hi = (
            int(x) for x in os.environ.get("BENCH_WEAK_LEVELS", "1,4").split(",")
        )
        n_weak = int(os.environ.get("BENCH_WEAK_PAGES", "0")) or 100_000
        n_windows = int(os.environ.get("BENCH_WEAK_WINDOWS", "3"))
        for label, rows in (("small", n_weak // (hi // lo)), ("full", n_weak)):
            datagen.gen_pages(spark, rows).write.mode("overwrite").parquet(
                os.path.join(scratch, f"weak_pages_{label}")
            )
        spark.stop()  # nothing else may run during the paired windows
        weak_all = [w for w in (_weak_window(scratch) for _ in range(n_windows)) if w]
        if weak_all:
            med = statistics.median(w["weak_eff_paired"] for w in weak_all)
            # report the window closest to the median eff as the headline
            weak = dict(
                min(weak_all, key=lambda w: abs(w["weak_eff_paired"] - med)),
                weak_eff_paired=round(med, 3),
            )

    foreign.update(foreign_spark_jvms())
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end_to_end_wall_time",
                "bench_lock": bench_lock,
                "concurrent_spark_detected": bool(foreign),
                "foreign_spark_pids": sorted(foreign) or None,
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
                "weak_eff_paired": weak["weak_eff_paired"] if weak else None,
                "weak_window": weak,
                "weak_windows_all": [
                    w["weak_eff_paired"] for w in weak_all
                ] or None,
            }
        )
    )


if __name__ == "__main__":
    main()
