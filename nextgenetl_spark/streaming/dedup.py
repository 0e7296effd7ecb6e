"""Streaming deduplication: exact content-hash dedup over an unbounded
stream with bounded state.

Batch exact dedup (operators/dedup.py) is a groupBy over content hashes; the
streaming twin is ``dropDuplicates`` on the hash *with a watermark*, so state
for hashes older than the lateness bound is evicted instead of growing
forever — the standard shape for dedup-on-ingest of a document firehose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit only the first occurrence of each content hash within the
    watermark horizon. State size ≈ distinct hashes per horizon, not per
    stream lifetime (16-byte md5 + timestamp per entry)."""
    hashed = stream.withColumn("fp", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicates(["fp"])
