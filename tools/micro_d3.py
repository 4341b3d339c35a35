"""Stage-level wall breakdown of d3 (wordset_similarity_join) with noop
sinks — where do the seconds go at a given SF dir?

Usage: python tools/micro_d3.py <sf_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from wikidata_dump_processor_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scratch = os.environ.get("BENCH_SCRATCH", "/dev/shm/bench_scratch")
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark(
        "micro-d3", cpus=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.local.dir": os.path.join(scratch, "spark-local")},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    threshold = 0.9
    tp = int(round(threshold * 100)) - 1
    t: dict[str, float] = {}

    def noop(df, name):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t[name] = round(time.time() - t0, 3)
        print(f"  {name}: {t[name]}s", file=sys.stderr)

    d = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source").alias("grp"),
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("ws"),
    ).withColumn("n", F.size("ws"))
    noop(d, "1_wordsets")
    tok = d.select("id", "grp", "n", F.explode("ws").alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    plen = F.col("n") - F.floor((F.col("n") * tp + 99) / 100).cast("int") + 1
    rn = F.row_number().over(Window.partitionBy("id").orderBy("df", "w"))
    pref = (
        tok.join(freq, "w")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= plen)
        .select("grp", "w", "id", "n", "rn")
    )
    noop(pref, "2_prefixes")
    a = pref.select(
        F.col("id").alias("id_a"), "grp", "w",
        F.col("n").alias("na"), F.col("rn").alias("ra"),
    )
    b = pref.select(
        F.col("id").alias("id_b"), "grp", "w",
        F.col("n").alias("nb"), F.col("rn").alias("rb"),
    )
    alpha = F.floor(
        (F.lit(tp) * (F.col("na") + F.col("nb")) + (100 + tp - 1)) / (100 + tp)
    ).cast("int")
    cand_raw = (
        a.join(b, ["grp", "w"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("na", "nb") * 100 >= F.greatest("na", "nb") * tp)
            & (
                F.lit(1)
                + F.least(F.col("na") - F.col("ra"), F.col("nb") - F.col("rb"))
                >= alpha
            )
        )
        .select("id_a", "id_b")
    )
    noop(cand_raw, "3_cand_join")
    cand = cand_raw.distinct()
    noop(cand, "4_cand_distinct")
    va = d.select(F.col("id").alias("id_a"), F.col("ws").alias("ws_a"), F.col("n").alias("n_a"))
    vb = d.select(F.col("id").alias("id_b"), F.col("ws").alias("ws_b"), F.col("n").alias("n_b"))
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("n_shared", F.size(F.array_intersect("ws_a", "ws_b")))
        .filter(
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            >= threshold
        )
        .select("id_a", "id_b")
    )
    noop(out, "5_full_query")
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "stages": t}))
    for name, df in (("cand_raw", cand_raw), ("cand", cand), ("out", out)):
        print(f"{name} rows: {df.count()}", file=sys.stderr)


if __name__ == "__main__":
    main()
