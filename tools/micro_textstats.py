"""Micro-bench: per-document cost of the repetition features vs token
count (VERDICT r4 #2 'Done' evidence).

Round 4's ``top_bigram_frac`` / ``dup_char_frac`` were O(n²) per row
(filter-in-transform all-pairs counting — ~4M string comparisons per doc
at the 2000-token cap); round 5 replaced them with array_sort + one
run-length fold, O(n log n).  This tool times ``repetition_features``
over fixed-row-count corpora of growing token counts and prints the
per-doc cost and the cost-vs-tokens growth ratio: linear behavior shows
as time ratios tracking the token ratios (2x tokens -> ~2x time), where
the quadratic kernel showed ~4x.

Usage: python tools/micro_textstats.py [rows_per_level]

Measured (local[8], 2000 rows/level, min of 3 fresh-lineage reps):

    tokens=  250  wall=  0.76s  per_doc=  0.381 ms
    tokens=  500  wall=  0.88s  per_doc=  0.441 ms  time_ratio=1.16 (token_ratio=2.0)
    tokens= 1000  wall=  1.60s  per_doc=  0.801 ms  time_ratio=1.82 (token_ratio=2.0)
    tokens= 2000  wall=  3.37s  per_doc=  1.685 ms  time_ratio=2.10 (token_ratio=2.0)
    tokens= 4000  wall=  5.65s  per_doc=  2.825 ms  time_ratio=1.68 (token_ratio=2.0)

Time tracks tokens ~linearly (ratios 1.2-2.1 per 2x tokens; the old
quadratic kernel showed ~4x), i.e. the sort + run-length fold behaves
as O(n log n) with the split/lower preprocessing dominating at the low
end.

After the round-5 array-staging refactor (each split materialized ONCE
in a preceding projection instead of re-splitting per reference), the
same protocol measures ~4x faster at the top level, still linear:

    tokens=  250  wall=  0.32s  per_doc=  0.162 ms
    tokens=  500  wall=  0.32s  per_doc=  0.158 ms  time_ratio=0.97
    tokens= 1000  wall=  0.41s  per_doc=  0.207 ms  time_ratio=1.31
    tokens= 2000  wall=  0.69s  per_doc=  0.347 ms  time_ratio=1.68
    tokens= 4000  wall=  1.41s  per_doc=  0.707 ms  time_ratio=2.04
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOKEN_LEVELS = [250, 500, 1000, 2000, 4000]


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from pyspark.sql import functions as F

    from wikidata_dump_processor_spark.operators.textstats import (
        repetition_features,
    )
    from wikidata_dump_processor_spark.session import get_spark

    spark = get_spark("micro-textstats", cpus=8, shuffle_partitions=8)
    print(f"rows_per_level={rows}")
    prev = None
    for n_tok in TOKEN_LEVELS:
        # varied tokens with some repetition (worst-ish case: many runs);
        # the per-row doc_id prefix keeps the expression non-foldable (a
        # pure literal would be constant-folded once at plan time)
        text = " ".join(f"tok{i % (n_tok // 4)}" for i in range(n_tok))
        docs = spark.range(rows).select(
            F.col("id").alias("doc_id"),
            F.concat(F.col("id").cast("string"), F.lit(" " + text)).alias("text"),
        ).localCheckpoint(eager=True)

        # Each rep must carry a distinct lineage: re-collecting the SAME
        # DataFrame reuses the warm-up's shuffle map output (skipped
        # stages) and times only the tiny post-exchange read.  A
        # rep-varying literal column changes the map-stage RDD, forcing
        # the Project (the kernel under test) to re-execute.  The timed
        # action AGGREGATES the feature columns — a bare count() would
        # let Catalyst prune the expressions away entirely.
        def feats(rep):
            return repetition_features(
                docs.withColumn("_rep", F.lit(rep)), max_tokens=8000
            ).agg(
                F.sum("top_bigram_frac"), F.sum("dup_line_char_frac"),
                F.sum("dup_line_frac"), F.sum("dup_para_frac"),
            )

        feats(-1).collect()  # warm-up: codegen + JIT
        best = min(_timed(feats(rep)) for rep in range(3))
        per_doc_ms = best / rows * 1000
        ratio = "" if prev is None else f"  time_ratio={best / prev:.2f} (token_ratio={n_tok / prev_tok:.1f})"
        print(f"tokens={n_tok:5d}  wall={best:6.2f}s  per_doc={per_doc_ms:7.3f} ms{ratio}")
        prev, prev_tok = best, n_tok


def _timed(df) -> float:
    t0 = time.time()
    df.collect()
    return time.time() - t0


if __name__ == "__main__":
    main()
