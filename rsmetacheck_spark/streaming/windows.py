"""Structured Streaming windowed aggregation (SURVEY §2.9 notes the
reference is batch-only; this module exists because the engine also serves
event tables, and the batch q06_events_hourly has this exact semantics —
the streaming variant is the incremental-refresh path for it).

Watermarked tumbling-window counts over an events stream; tested by
driving a parquet-backed stream to completion with processAllAvailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_user_counts_stream(events_stream: DataFrame) -> DataFrame:
    """Watermarked per-(hour, user) event counts — the state a streaming
    top-k ("trending users") query maintains. Rank itself is NOT a
    streaming-supported operator; the consumer ranks the aggregation
    state per emit (foreachBatch in production, the complete-mode sink
    in the oracle row st09) — the state stays bounded at
    (#open windows × #active users) regardless of stream length."""
    return (
        events_stream
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "user_id", "n",
        )
    )


def hourly_event_counts_stream(events_stream: DataFrame) -> DataFrame:
    return (
        events_stream
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        # order-independent float sum (decimal in, double out) — the
        # stream's partial aggregation order must not change the result
        # vs batch q06, which uses the same decimal path
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "event_type", "n", "sum_value",
        )
    )
