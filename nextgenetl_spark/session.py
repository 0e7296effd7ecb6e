"""SparkSession factory.

The reference's execution substrate is BigQuery (common_etl/support.py:775-821);
ours is Spark. This module centralizes the session config so every entry point
(tests, bench, driver contract) runs with the same scale-aware settings:

- AQE on: runtime coalescing of shuffle partitions + skew-join handling means
  the same plan works at sf0.001 and at 100 TB without retuning.
- Arrow on: any pandas_udf / toPandas path is Arrow-batched, never row-at-a-time.
- Broadcast threshold left at default (10 MB) — dimension tables (region,
  nation, supplier, part at small SF) broadcast automatically; at 100 TB the
  facts stay shuffled on their join keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "nextgenetl-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``shuffle_partitions`` defaults to the local core count: at local[N] a
    larger value only adds task-scheduling overhead, while on a real cluster
    AQE coalesces the post-shuffle partitions anyway.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type — read as long and convert in catalog.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
