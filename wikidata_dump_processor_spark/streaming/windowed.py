"""Event-time windowed aggregation with watermark-based late-data
handling.

The reference has no event-time processing (SURVEY.md §2.9), but the
engine's `events` workload does: this is the standard Structured
Streaming shape — `withWatermark` bounds state, tumbling windows
aggregate, and events arriving later than the watermark are dropped
instead of growing state forever.  Batch counterpart (same semantics on
a static frame, oracle-checked as driver query a4): ``windowed_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch tumbling-window aggregation over event time: one row per
    (window, event_type) with count + value sum (cast per the oracle
    type conventions)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(14,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def windowed_event_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming form: tumbling event-time windows with a watermark.

    Append mode = a window's row is emitted exactly once, when the
    watermark passes its end; events later than the watermark are
    DROPPED (bounded state — the property that matters at 100 TB/day of
    events).  Trigger.AvailableNow drains everything new, advancing the
    watermark between micro-batches; returns the finished query."""
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
