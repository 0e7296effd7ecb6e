"""Small-file compaction for parquet lake dirs.

The reference never needs this (BigQuery manages storage), but any
long-running lake accumulates small files — streaming sinks, per-batch
appends, over-parallel writes — and at 100 TB the file count itself becomes
the planner/scan bottleneck (footer reads, task-per-file scheduling).
Compaction rewrites a directory into ~target-size files:

- unpartitioned: one round-robin ``repartition(n)`` where n is derived from
  the measured input bytes (an even-size shuffle; ``shuffle=False`` swaps to
  ``coalesce`` which merges map-side with no shuffle but can leave uneven
  files),
- hive-partitioned: ``repartition(n, *partition_cols)`` +
  ``partitionBy`` write, bounding files per partition value while keeping
  the pruning layout intact.

Bytes are measured from the filesystem listing (no Spark job), so the plan
stays one read + one write.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes_and_files(path: str, suffix: str = ".parquet") -> tuple[int, int]:
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    shuffle: bool = True,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_file_bytes`` files.

    Returns {files_before, files_after, bytes_before, n_output_partitions}.
    ``shuffle=True`` uses repartition (even file sizes, one exchange);
    ``shuffle=False`` uses coalesce (no exchange — merges co-located map
    outputs; correct but size-uneven when input files vary). With
    ``partition_by`` the repartition keys on the partition columns so each
    hive partition is written by at most ``n`` tasks, preserving the
    pruning layout without a file explosion (tasks × partitions)."""
    bytes_before, files_before = _dir_bytes_and_files(src)
    n = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.parquet(src)
    if partition_by:
        out = df.repartition(n, *partition_by)
        writer = out.write.mode("overwrite").partitionBy(*partition_by)
    elif shuffle:
        writer = df.repartition(n).write.mode("overwrite")
    else:
        writer = df.coalesce(n).write.mode("overwrite")
    writer.parquet(dst)
    _, files_after = _dir_bytes_and_files(dst)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "n_output_partitions": n,
    }
