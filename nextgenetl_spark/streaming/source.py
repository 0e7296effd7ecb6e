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

def _stage_symlinks(src: str, stage: str) -> None:
    """Stage a table into a file-source landing directory via symlinks.
    Spark's file stream source lists FILES in the directory (no recursion),
    so a directory-shaped table (multi-file parquet) is staged by linking
    each inner data file; a single-file table links as itself. New part
    files appearing in the source dir are linked on the next call — the
    incremental-landing shape a real deployment has natively."""
    import glob as _glob
    import os

    os.makedirs(stage, exist_ok=True)
    if os.path.isdir(src):
        parts = [
            p
            for p in sorted(_glob.glob(os.path.join(src, "*.parquet")))
            if not os.path.basename(p).startswith(("_", "."))
        ]
    else:
        parts = [src]
    # Prune symlinks whose target vanished (an in-place source regeneration
    # renames part files): a dangling link fails os.path.exists, so the
    # old guard both re-linked same-basename stale links (FileExistsError)
    # and left different-basename danglers to break the stream listing.
    for entry in os.listdir(stage):
        link = os.path.join(stage, entry)
        if os.path.islink(link) and not os.path.exists(link):
            os.unlink(link)
    for p in parts:
        link = os.path.join(stage, os.path.basename(p))
        if not os.path.lexists(link):
            os.symlink(p, link)


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
    _stage_symlinks(src, stage)
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

    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stage = f"/tmp/nextgenetl_streams/{hashlib.md5(src.encode()).hexdigest()[:12]}"
    _stage_symlinks(src, stage)

    # Footer-only probe (pyarrow, no Spark job, NO session conf) decides
    # the read type for ts: nanos → request LongType in the EXPLICIT stream
    # schema (the parquet reader accepts INT64 TIMESTAMP(NANOS) → LongType
    # without spark.sql.legacy.parquet.nanosAsLong), tz-less micros → NTZ,
    # tz-aware → TimestampType. Same conf-pure discipline — and the same
    # footer reader — as catalog.load: _footer_schema handles a
    # directory-shaped events.parquet (multi-file table), where a raw
    # pq.read_schema on the table path would raise, diverging batch from
    # streaming on the same lake layout.
    from nextgenetl_spark.catalog import _footer_schema

    arrow_ts = _footer_schema(sf_dir, "events").field("ts").type
    if getattr(arrow_ts, "unit", None) == "ns":
        ts_type: T.DataType = T.LongType()
    elif getattr(arrow_ts, "tz", None) is None:
        ts_type = T.TimestampNTZType()
    else:
        ts_type = T.TimestampType()
    reader = spark.readStream.schema(_events_raw_schema(ts_type))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stage)
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # NTZ → TIMESTAMP for schema parity with catalog.load (same column
        # type in batch and streaming plans, stable state-store schemas).
        # make_timestamp with an EXPLICIT zone interprets the wall-clock
        # components directly — value-preserving under ANY caller session
        # zone, no session-timeZone write (a plain cast would shift by the
        # session offset).
        df = df.withColumn(
            "ts",
            F.expr(
                "make_timestamp(year(ts), month(ts), day(ts), "
                "hour(ts), minute(ts), date_part('SECOND', ts), 'UTC')"
            ),
        )
    return df


def replay_shuffle_cap(spark: SparkSession, cap: int = 16):
    """Scoped shuffle-partition cap for bounded stateful replays.

    Stateful streaming sizes its state store by ``spark.sql.shuffle.
    partitions`` AT QUERY START and AQE cannot coalesce them: under a
    default session (200) a small availableNow replay pays 200 state-store
    partitions of per-partition fixed cost (~3-5× wall on the driver's
    gate). There is no per-query override in Spark, so the cap must be a
    session conf — this context manager makes the write SCOPED: set before
    ``.start()``, restored in ``finally`` after the replay, so no lasting
    session mutation escapes (a concurrent query in the same session during
    the replay window would still observe the cap — the documented limit of
    Spark's conf model). A real deployment sizes the conf to its state
    volume at session build instead. Default 16: measured on the sf0.1
    debounce/session replays, 8-16 state-store partitions run ~25-30%
    faster than 32 (fewer per-partition store fixed costs) while 4 loses
    task parallelism; 16 keeps headroom for larger replays."""
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        key = "spark.sql.shuffle.partitions"
        prev = spark.conf.get(key, "200")
        capped = max(4, min(cap, spark.sparkContext.defaultParallelism))
        changed = int(prev) > capped
        if changed:
            spark.conf.set(key, str(capped))
        try:
            yield
        finally:
            if changed:
                spark.conf.set(key, prev)

    return _scope()


def run_memory_replay(
    spark: SparkSession,
    out: DataFrame,
    name: str,
    output_mode: str = "append",
    cap: int = 16,
    timeout_s: int = 300,
) -> DataFrame:
    """Run a bounded availableNow replay of ``out`` into a memory sink named
    ``name`` under a scoped state-store partition cap (``replay_shuffle_cap``)
    and return the sink table. The shared tail of every stream_* workload —
    one place owns the start/await/stop/restore discipline."""
    with replay_shuffle_cap(spark, cap):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            # stop() in finally: if awaitTermination raises (e.g.
            # StreamingQueryException) the query must not be left running
            # with the memory sink name claimed — the next replay under the
            # same name would fail forever.
            q.stop()
    return spark.table(name)


def embeddings_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the embeddings parquet — the serving shape of
    an ANN lookup pipeline (query-vector batches landing in a directory).
    Same symlink staging as ``events_stream``; schema is static."""
    import hashlib
    import os

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    stage = f"/tmp/nextgenetl_streams/{hashlib.md5(src.encode()).hexdigest()[:12]}"
    _stage_symlinks(src, stage)
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
