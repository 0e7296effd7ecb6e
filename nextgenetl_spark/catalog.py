"""Test-data catalog: lazy loaders for the driver's parquet tables.

The reference addresses tables by `project.dataset.table` id strings
(cda_bq_etl/utils.py:271-306); here a table is a parquet path under a
scale-factor directory. Reads are plain ``spark.read.parquet`` so Catalyst
gets column pruning + filter pushdown into the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped as TIMESTAMP(NANOS) (rejected by the
        # parquet reader unless nanos surface as long) or TIMESTAMP(MICROS)
        # without zone (reads as TIMESTAMP_NTZ). Runtime-settable, so the
        # engine works under ANY caller-provided session (the driver builds
        # its own), not just sessions from our factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Normalize the scan edge so every operator downstream sees a plain
    # TimestampType regardless of the file's physical resolution: nanos-as-
    # long → truncate to micros; NTZ → retag (session tz is pinned to UTC,
    # so the cast shifts no values).
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-style pipelines)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
