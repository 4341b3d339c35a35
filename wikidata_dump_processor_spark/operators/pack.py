"""Sequence packing: map documents onto fixed-token-budget training
sequences.

An LLM training pipeline does not feed one document per sequence — it
concatenates documents and slices the stream into fixed-length windows
(the GPT-style concat-and-chunk loader).  At 100 TB the pack plan must
be computed distributed, ahead of time, deterministically: a trainer
resuming at pack N must see byte-identical membership.

Re-expressed Spark-first: documents are hashed into ``n_buckets``
independent streams (the parallelism unit — packing never crosses a
bucket), ordered by id within the bucket, given exclusive token spans
``[start, end)`` by a window cumsum, and each document emits one row
per budget-sized chunk its span overlaps (``sequence`` + ``explode`` —
pure JVM, no Python, no driver state).  Every pack is exactly
``budget`` tokens except the last pack of each bucket.

Scale notes:

* ONE shuffle (the bucket-hash exchange for the cumsum window); the
  per-bucket sort is bounded by corpus_size / n_buckets — size
  ``n_buckets`` to ~4x total cores so no task sorts more than a few
  GB of (id, token_count) pairs.  Text never shuffles: the window
  reads only the id + token-count projection when ``token_count_col``
  is precomputed (the recommended 100-TB form).
* output rows = total_tokens / budget + #docs (each doc adds at most
  one boundary row per chunk it touches) — linear, no blow-up.
* determinism: pack membership is a pure function of
  (ids, token counts, budget, n_buckets) — no rand(), no
  partition-order dependence; re-runs and resumes see the same packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textstats import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, pack_id, pack_start, pack_end, doc_offset) — one row per
    (document, pack) segment, GPT-style concat-and-chunk semantics.

    * ``pack_id`` — ``"<bucket>-<chunk>"``; every pack holds exactly
      ``budget`` tokens (last pack of a bucket may be short).
    * ``pack_start``/``pack_end`` — the segment's token positions
      within the pack (``[0, budget)``).
    * ``doc_offset`` — where the segment starts inside the document
      (0 for the first segment; a long doc spans several packs).

    ``token_count_col`` supplies a precomputed token count (the 100-TB
    form — the window then never touches text); otherwise whitespace
    ``token_count(text)`` is computed inline.  Zero-token documents
    occupy no span and are omitted.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = (
        F.col(token_count_col)
        if token_count_col
        else token_count(F.col(text_col))
    ).cast("long")
    d = docs.select(F.col(id_col), toks.alias("_toks")).filter(
        F.col("_toks") > 0
    )
    d = d.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    )
    w = Window.partitionBy("_bucket").orderBy(id_col)
    d = d.withColumn("_end", F.sum("_toks").over(w)).withColumn(
        "_start", F.col("_end") - F.col("_toks")
    )
    first_chunk = F.floor(F.col("_start") / budget).cast("long")
    last_chunk = F.floor((F.col("_end") - 1) / budget).cast("long")
    d = d.withColumn("_chunk", F.explode(F.sequence(first_chunk, last_chunk)))
    chunk_base = F.col("_chunk") * budget
    seg_start = F.greatest(F.col("_start"), chunk_base)
    return d.select(
        id_col,
        F.concat_ws("-", "_bucket", "_chunk").alias("pack_id"),
        (seg_start - chunk_base).alias("pack_start"),
        (F.least(F.col("_end"), chunk_base + budget) - chunk_base).alias(
            "pack_end"
        ),
        (seg_start - F.col("_start")).alias("doc_offset"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Bounded audit of a pack plan: one row — #packs, #segments, mean
    fill fraction, #underfull packs (bucket tails).  Safe to collect
    into a manifest."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(F.col("pack_end") - F.col("pack_start")).alias("fill"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_segments").alias("n_segments"),
        F.avg(F.col("fill") / budget).alias("mean_fill"),
        F.count(F.when(F.col("fill") < budget, 1)).alias("underfull_packs"),
    )
