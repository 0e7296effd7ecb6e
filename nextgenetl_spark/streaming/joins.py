"""Streaming joins: stream-static enrichment and stream-stream interval
joins.

Scale design: a stream-static join is stateless — each micro-batch joins
against the (broadcastable) dimension snapshot, so state is zero and the
dim can be refreshed between batches. A stream-stream interval join keeps
both sides' rows in the state store until the watermark passes the join
window's far edge; the time-range condition is what lets Spark compute
that eviction bound — an unconstrained stream-stream join would hold
state forever. Reference has no streaming (SURVEY §2.11); this is the
extension surface a landing-zone pipeline needs (enrich-on-ingest,
attribution within a lookback window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Stream-static enrichment join. The static side is marked broadcast —
    at scale the dim ships once per executor instead of shuffling the
    stream; the stream side keeps its partitioning, so no state store is
    involved at all."""
    return stream.join(F.broadcast(dim), on, how)


def interval_self_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    lookback: str = "10 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream self-join: for every ``left_type`` event, all
    ``right_type`` events from the same user in the preceding ``lookback``
    window (click→purchase attribution shape).

    Both sides carry watermarks and the join condition carries the time
    range — together they bound state: a buffered right-side row is
    dropped once the watermark passes ``its ts + lookback``; left rows
    emit as soon as matches arrive (inner join). lookback must be parsable
    by INTERVAL SQL syntax."""
    left = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark_delay)
    )
    right = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark_delay)
    )
    return left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL {lookback} AND l_ts"
        ),
        "inner",
    )


def anti_join_history(stream: DataFrame, history: DataFrame, on) -> DataFrame:
    """Stream-static LEFT ANTI join: pass through only stream rows whose
    key is absent from the historical snapshot — dedup-on-ingest against
    an existing corpus. Stateless (each micro-batch probes the static
    side), so unlike watermarked dropDuplicates there is no state to
    grow; the history side broadcasts when small or shuffles once per
    batch when not."""
    return stream.join(F.broadcast(history), on, "left_anti")
