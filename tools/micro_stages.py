"""Isolate per-stage scaling: read a pre-materialized parsed table, time
each downstream computation warm at one parallelism level.

Setup:   python tools/micro_stages.py setup [n_pages]
Measure: SPARK_GRAFT_CPUS=8 python tools/micro_stages.py run
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARSED = "/tmp/micro_parsed"

from pyspark.sql import functions as F  # noqa: E402

from wikidata_dump_processor_spark import datagen  # noqa: E402
from wikidata_dump_processor_spark.operators import triples as TR  # noqa: E402
from wikidata_dump_processor_spark.operators.mentions import detect_mentions  # noqa: E402
from wikidata_dump_processor_spark.operators.text_extract import extract_text  # noqa: E402
from wikidata_dump_processor_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("micro2", cpus=cpus, shuffle_partitions=max(cpus, 8))
    if len(sys.argv) > 1 and sys.argv[1] == "setup":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
        pages = datagen.gen_pages(spark, n, partitions=32)
        TR.parse_entities(extract_text(pages)).write.mode("overwrite").parquet(PARSED)
        print("setup done")
        return

    parsed = spark.read.parquet(PARSED)
    aliases = datagen.gen_aliases(spark)
    t: dict[str, list[float]] = {}

    def clock(name, fn, reps=2):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 2))
        t[name] = ts
        print(f"  {name}: {ts}", file=sys.stderr)

    clock("scan_only", lambda: parsed.select("id").filter("id is not null").count())
    clock("claim_triples", lambda: TR.claim_triples(TR.item_entities(parsed)).count())
    clock("mention_regex", lambda: TR.mention_regex_triples(TR.item_entities(parsed)).count())
    clock("items_table", lambda: TR.items_table(parsed).count())
    clock("label_pref", lambda: TR.with_preferred_label(TR.item_entities(parsed)).select("label").count())
    clock("trie_scan", lambda: detect_mentions(parsed, aliases).count())
    clock("write_triples", lambda: TR.claim_triples(TR.item_entities(parsed)).repartition(F.col("pred")).write.mode("overwrite").partitionBy("pred").parquet(f"/tmp/micro_out_{cpus}"))
    print(json.dumps({"cpus": cpus, "stages": t}))


if __name__ == "__main__":
    main()
