"""Watermarked window aggregations.

Each function takes ANY events-shaped DataFrame — batch or streaming.
On a streaming input, apply a watermark first (``with_watermark``) so state
for closed windows is dropped; on batch input the same plan just runs.
This one-plan-two-modes design is the Spark-native way to keep streaming
semantics testable against a batch oracle.

State-size notes for 100 TB/day streams: tumbling windows keep one state
row per (window, event_type); session windows one per (user, open session);
the watermark bounds both. Shuffle is on the groupBy keys exactly as in
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark(ts_col, delay)


def tumbling_window_agg(events: DataFrame, window: str = "5 minutes", ts_col: str = "ts") -> DataFrame:
    """Tumbling count/sum per (window, event_type) — streaming twin of the
    batch ``tumbling_window`` workload (same output schema)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding (hopping) window: each event lands in window/slide windows."""
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            F.unix_timestamp(F.col("w.end")).alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    """Native session windows (``session_window``): per-user sessions closed
    after ``gap`` inactivity — the streaming twin of the lag-based batch
    ``sessionize`` workload. Output: one row per (user, session)."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
            "value_sum",
        )
    )
