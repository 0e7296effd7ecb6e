"""Streaming source helpers for the driver's events table.

``events.parquet`` has shipped with either TIMESTAMP(MICROS) (reads
natively) or TIMESTAMP(NANOS) (reads as long under
``spark.sql.legacy.parquet.nanosAsLong``). A cheap batch probe of the
footer schema decides which; the stream source then converts at the edge
exactly like catalog.load does for batch, so streaming and batch plans
see the same schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),  # long = nanos-as-long; else native timestamp
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def docs_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the documents parquet — the ingest shape of a
    text-curation pipeline (new crawl shards landing in a directory). Same
    symlink staging as ``events_stream``; schema is static."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    stage = f"/tmp/nextgenetl_streams/{hashlib.md5(src.encode()).hexdigest()[:12]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage)


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch unit; use availableNow trigger for bounded runs).

    Spark's file stream source requires a DIRECTORY; the driver ships a
    single file, so we stage a symlink dir (a real deployment points this
    at the landing directory new files arrive in)."""
    import hashlib
    import os

    from nextgenetl_spark.catalog import _parquet_ts_unit

    if _parquet_ts_unit(f"{sf_dir}/events.parquet") == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Stateful streaming sizes its state store by shuffle partitions AT
    # QUERY START and AQE cannot coalesce them; under a default session
    # (200) a small replay pays 200 state-store partitions of overhead
    # (~3-5x wall on the driver's gate). Cap to the core count. A real
    # deployment sizes this to its state volume instead.
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, min(64, cores))))
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stage = f"/tmp/nextgenetl_streams/{hashlib.md5(src.encode()).hexdigest()[:12]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    # Probe the footer once (planning-time only, no data read) so the stream
    # schema matches whatever resolution this file actually stores.
    ts_type = spark.read.parquet(stage).schema["ts"].dataType
    reader = spark.readStream.schema(_events_raw_schema(ts_type))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage)
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Cast NTZ -> TIMESTAMP for schema parity with catalog.load (same
        # column type in batch and streaming plans, and stable state-store
        # schemas across runs). The cast reinterprets the wall-clock value
        # in the session zone, so pin UTC first — under a caller session in
        # any other zone every timestamp would silently shift by the offset.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def embeddings_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the embeddings parquet — the serving shape of
    an ANN lookup pipeline (query-vector batches landing in a directory).
    Same symlink staging as ``events_stream``; schema is static."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    stage = f"/tmp/nextgenetl_streams/{hashlib.md5(src.encode()).hexdigest()[:12]}"
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "embeddings.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stage)
