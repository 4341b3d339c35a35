"""Microbench: extract+parse stage alone, repeated, one parallelism level.

Usage: SPARK_GRAFT_CPUS=8 python tools/micro_extract.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wikidata_dump_processor_spark import datagen  # noqa: E402
from wikidata_dump_processor_spark.operators import triples as TR  # noqa: E402
from wikidata_dump_processor_spark.operators.text_extract import extract_text  # noqa: E402
from wikidata_dump_processor_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("micro", cpus=cpus, shuffle_partitions=max(cpus, 8))
    pages = datagen.gen_pages(spark, n).localCheckpoint(eager=True)
    pages.count()
    times = []
    for _ in range(reps):
        t0 = time.time()
        # count() on the full extract+parse plan — no write, pure compute
        TR.parse_entities(extract_text(pages)).select("id").filter("id is not null").count()
        times.append(round(time.time() - t0, 2))
    print(json.dumps({"cpus": cpus, "n": n, "times": times}))


if __name__ == "__main__":
    main()
