"""Bucketed (co-located) tables: shuffle-free joins and aggregations on the
bucket key.

The reference's only physical-layout lever is ``CLUSTER BY``
(common_etl/support.py:1148-1160) — BigQuery clustering prunes blocks but
does not co-locate joins. Spark bucketing goes further: both sides of an
equi-join written with the same ``bucketBy(n, key)`` hash layout join with
ZERO exchange — the single biggest shuffle eliminator for a fact table that
is repeatedly joined on the same key (e.g. a 100-TB lineitem bucketed by
orderkey joined to orders across many pipeline steps).

Cost model: one extra shuffle at write time buys every subsequent join/agg
on that key for free. Bucket count should put one bucket's data in the
100-500 MB range at target scale (100 TB / 256 MB ≈ 400k buckets — cap by
key cardinality and file-count limits; compose with partitionBy(date) so
each partition holds the bucket fan-out).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _clear_residual_location(spark: SparkSession, table: str) -> None:
    """Remove a managed-table directory left behind by a crashed run.

    A killed write can leave the managed location on disk while the
    (fresh or re-created) metastore has no such table: ``DROP TABLE IF
    EXISTS`` is then a no-op and every later ``saveAsTable`` fails with
    LOCATION_ALREADY_EXISTS — permanently, until someone hand-deletes the
    dir. Only fires when the metastore does NOT know the table (a
    registered table's location is owned by the DROP path, not us), and
    resolves the location the way Spark does — ``warehouse/<db>.db/<t>``
    for a non-default database, ``warehouse/<t>`` for default — so a
    table name scoped to one database can never rmtree another database's
    directory."""
    if "." in table:
        db, name = table.rsplit(".", 1)
    else:
        db, name = spark.catalog.currentDatabase(), table
    # Bail only for a CATALOG table (its location is owned by the DROP
    # path). tableExists also matches temp views, and a temp view merely
    # shadowing the name must not suppress the residual-dir cleanup
    # (round-4 ADVICE) — so check listTables filtered to non-temporary.
    try:
        if any(
            t.name.lower() == name.lower() and t.tableType != "TEMPORARY"
            for t in spark.catalog.listTables(db)
        ):
            return
    except Exception:
        pass  # database absent → no catalog table → cleanup may proceed
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if db == "default":
        loc = os.path.join(warehouse, name.lower())
    else:
        loc = os.path.join(warehouse, f"{db.lower()}.db", name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 8,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Sorting within buckets additionally enables sort-merge joins with
    no sort step (the reference's CLUSTER BY analogue, but join-exploiting).

    Idempotent against crash residue: an orphaned warehouse directory with
    no metastore entry (interrupted earlier run) is cleared before writing
    instead of failing LOCATION_ALREADY_EXISTS forever."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if mode == "overwrite":
        _clear_residual_location(df.sparkSession, table)
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin whose children read bucketed
    scans directly — no Exchange on either side (verify with
    ``plan_has_no_exchange``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_no_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains no shuffle Exchange — the
    co-location check used by tests and plan reviews."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
