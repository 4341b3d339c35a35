"""Optimization-round measurement harness (guide §1.4): time individual
catalog queries with the noop sink (computation only, no toPandas/sink
cost), and dump ``.explain("formatted")`` for plan audits.

NOT part of the frozen driver contract — ``bench.py`` stays the
measurement of record; this file exists so optimization work can isolate
one query at an arbitrary SF dir and capture before/after plans
(plans/r07/*.txt).

Usage:
  python bench_extra.py time  <sf_dir> <query> [reps]
  python bench_extra.py plan  <sf_dir> <query> <out_file>
  python bench_extra.py count <sf_dir> <query>      # rows, for sanity
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    mode, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    from wikidata_dump_processor_spark.queries_catalog import (
        PYTEST_ORACLES,
        SPARK_QUERIES,
    )
    from wikidata_dump_processor_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scratch = os.environ.get("BENCH_SCRATCH", "/dev/shm/bench_scratch")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        "bench-extra", cpus=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    fn = SPARK_QUERIES.get(name) or PYTEST_ORACLES[name][0]

    if mode == "plan":
        out_file = sys.argv[4]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(out_file, "w") as f:
            f.write(plan)
        print(f"wrote {out_file} ({len(plan)} bytes)")
        return

    if mode == "count":
        print(fn(spark, sf_dir).count())
        return

    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark.sparkContext.setJobDescription(f"warmup:{name}")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"{name}:rep{r}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({
        "query": name, "sf_dir": sf_dir, "cpus": cpus,
        "reps": times, "median": round(statistics.median(times), 3),
        "min": min(times),
    }))


if __name__ == "__main__":
    main()
