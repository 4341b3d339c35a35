"""Per-stage wall-time profile of the KG pipeline at one parallelism level.

Usage: SPARK_GRAFT_CPUS=8 python tools/profile_stages.py [n_pages]
Prints one JSON line with per-stage seconds.
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

from pyspark.sql import functions as F  # noqa: E402

from wikidata_dump_processor_spark import datagen  # noqa: E402
from wikidata_dump_processor_spark.operators import triples as TR  # noqa: E402
from wikidata_dump_processor_spark.operators.canonicalize import (  # noqa: E402
    canonical_map,
    rewrite_triples,
)
from wikidata_dump_processor_spark.operators.linking import (  # noqa: E402
    link_mentions,
    mention_triples,
)
from wikidata_dump_processor_spark.operators.text_extract import (  # noqa: E402
    extract_and_detect,
    exploded_mentions,
)
from wikidata_dump_processor_spark.session import get_spark  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    spark = get_spark("profile", cpus=cpus, shuffle_partitions=max(cpus, 8))
    out = tempfile.mkdtemp(prefix="prof_kg_")
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr)
        return r

    try:
        pages = clock("datagen", lambda: datagen.gen_pages(spark, n).localCheckpoint(eager=True))
        aliases = datagen.gen_aliases(spark)
        catalog = datagen.gen_entity_catalog(spark)

        def w(df, name):
            df.write.mode("overwrite").parquet(os.path.join(out, name))
            return spark.read.parquet(os.path.join(out, name))

        parsed = clock(
            "extract+scan+parse (fused)",
            lambda: w(
                TR.parse_entities(extract_and_detect(pages, aliases), extra_cols=("mentions",)),
                "extracted",
            ),
        )
        n_salts = max(1, min(cpus, n // 25_000))
        salt = F.pmod(F.xxhash64("subj"), F.lit(n_salts))
        triples = clock(
            "triples",
            lambda: w(TR.extract_triples(parsed).repartition(F.col("pred"), salt), "triples"),
        )
        clock("items", lambda: w(TR.items_table(parsed), "items"))
        clock("props", lambda: w(TR.props_catalog(parsed), "props"))
        linked = clock(
            "link (explode+join)",
            lambda: w(link_mentions(exploded_mentions(parsed), aliases, catalog), "mentions"),
        )
        all_triples = triples.select("subj", "pred", "obj", "src_url").unionByName(
            mention_triples(linked.select("url", "qid"))
        )
        cmap = clock("canonical_map(CC)", lambda: canonical_map(all_triples).localCheckpoint(eager=True))
        clock("rewrite+write", lambda: w(rewrite_triples(all_triples, cmap), "canonical"))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "n_pages": n, "stages": t, "total": round(sum(t.values()), 2)}))


if __name__ == "__main__":
    main()
