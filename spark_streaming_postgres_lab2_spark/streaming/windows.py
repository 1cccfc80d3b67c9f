"""Streaming windowed aggregations: the streaming flavor of the
analytics views (SURVEY §2.4 A4/A5 notes).

- ``windowed_event_counts``: tumbling event-time window x event_type --
  the streaming twin of v_hourly_event_summary.  COUNT(DISTINCT) is not
  supported in streaming aggregation, so unique users map to
  ``approx_count_distinct`` (HLL), the documented mapping.
- ``session_window_rollup``: native gap-based session windows -- the
  streaming twin of v_user_sessions (the batch engine sessionizes with
  lag/cumsum, queries/core.q_sessionization).

Both are watermark-bounded so state is evicted and the operators run
indefinitely at constant memory per key-window."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "event_time",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.approx_count_distinct("user_id").alias("approx_unique_users"),
            F.sum("total_amount").alias("total_revenue"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "event_count",
            "approx_unique_users",
            "total_revenue",
        )
    )


def session_window_rollup(
    stream: DataFrame,
    ts_col: str = "event_time",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase_count"),
            F.sum("total_amount").alias("total_spent"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "event_count",
            "purchase_count",
            "total_spent",
        )
    )
