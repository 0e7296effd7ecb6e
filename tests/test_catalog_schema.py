"""Catalog/INFORMATION_SCHEMA surface (SURVEY N10) + TIME-type ingest parity.

The reference drives release-over-release schema diffs off
INFORMATION_SCHEMA.COLUMNS (compare_clinical_gdc_api_releases.py:79-136);
here that surface is a queryable DataFrame built from parquet footers —
no scan, no Spark job for the metadata itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nextgenetl_spark.catalog import (
    TABLES,
    catalog_columns,
    information_schema_columns,
    information_schema_tables,
    register_views,
    sql_type_name,
)
from tests.conftest import SF_SMOKE


def test_sql_type_name_vocabulary():
    assert sql_type_name(T.LongType()) == "BIGINT"
    assert sql_type_name(T.IntegerType()) == "INTEGER"
    assert sql_type_name(T.DoubleType()) == "DOUBLE"
    assert sql_type_name(T.FloatType()) == "FLOAT"
    assert sql_type_name(T.StringType()) == "VARCHAR"
    assert sql_type_name(T.BooleanType()) == "BOOLEAN"
    assert sql_type_name(T.DateType()) == "DATE"
    assert sql_type_name(T.BinaryType()) == "BLOB"
    # timestamps collapse: physical resolution / NTZ-ness is a storage detail
    assert sql_type_name(T.TimestampType()) == "TIMESTAMP"
    assert sql_type_name(T.TimestampNTZType()) == "TIMESTAMP"
    assert sql_type_name(T.ArrayType(T.FloatType())) == "FLOAT[]"
    assert sql_type_name(T.DecimalType(38, 9)) == "DECIMAL(38,9)"
    assert (
        sql_type_name(T.StructType([T.StructField("a", T.LongType())]))
        == "STRUCT(a BIGINT)"
    )


def test_information_schema_columns_queryable(spark):
    df = information_schema_columns(spark, SF_SMOKE)
    assert df.columns == [
        "table_name", "ordinal_position", "column_name", "data_type", "is_nullable",
    ]
    # it is a real DataFrame: filter/join/agg like any table
    emb = {r["column_name"]: r["data_type"] for r in df.filter(F.col("table_name") == "embeddings").collect()}
    assert emb["embedding"] == "FLOAT[]"
    assert emb["vec_id"] == "BIGINT"
    # events.ts reports TIMESTAMP regardless of the file's physical unit
    ts = df.filter((F.col("table_name") == "events") & (F.col("column_name") == "ts")).collect()
    assert ts[0]["data_type"] == "TIMESTAMP"
    # every lake table is present with 1..n ordinal positions
    per_table = {
        r["table_name"]: r["n"]
        for r in df.groupBy("table_name").agg(F.count("*").alias("n"), F.min("ordinal_position").alias("lo"), F.max("ordinal_position").alias("hi")).withColumn("n", F.col("n")).collect()
    }
    assert set(per_table) == set(TABLES)


def test_information_schema_tables_row_counts_are_exact(spark):
    meta = {r["table_name"]: r for r in information_schema_tables(spark, SF_SMOKE).collect()}
    assert set(meta) == set(TABLES)
    # footer metadata must equal a real scan's count
    for t in ("region", "documents"):
        real = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").count()
        assert meta[t]["n_rows"] == real
        assert meta[t]["n_columns"] >= 2


def test_information_schema_over_many_file_table_dir(spark, tmp_path):
    """The distributed footer walk (round-8 verdict ask #4) over a
    directory-backed table with MANY part files: row counts sum across
    every part's footer, column counts stay top-level-field counts, and
    the single-footer schema path still works — all through the
    parallelized read, not a driver loop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nextgenetl_spark import catalog as cat

    lake = tmp_path / "lake"
    part_dir = lake / "region.parquet"
    part_dir.mkdir(parents=True)
    total = 0
    for i in range(40):
        n = 3 + (i % 5)
        total += n
        tbl = pa.table(
            {
                "r_regionkey": pa.array(range(n), type=pa.int64()),
                "r_name": pa.array([f"r{i}_{j}" for j in range(n)]),
            }
        )
        pq.write_table(tbl, part_dir / f"part-{i:05d}.parquet")
    # a LATER part file evolves the schema (adds a column): BigQuery
    # CURRENT-schema semantics (round-10 verdict ask #2) — the added
    # column IS visible in both views, appended after the base columns,
    # nullable because it's absent from earlier parts
    total += 2
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([99, 100], type=pa.int64()),
                "r_name": pa.array(["zz", "zy"]),
                "r_comment": pa.array(["new", "col"]),
            }
        ),
        part_dir / "part-99999.parquet",
    )
    old_tables = cat.TABLES
    cat.TABLES = ("region",)
    try:
        meta = {r["table_name"]: r for r in information_schema_tables(spark, str(lake)).collect()}
        assert meta["region"]["n_rows"] == total
        assert meta["region"]["n_columns"] == 3  # unified schema: evolved col counts
        cols = information_schema_columns(spark, str(lake)).collect()
        assert {(r["column_name"], r["data_type"]) for r in cols} == {
            ("r_regionkey", "BIGINT"),
            ("r_name", "VARCHAR"),
            ("r_comment", "VARCHAR"),
        }
        by_name = {r["column_name"]: r for r in cols}
        # base columns keep their first-file order; the evolved column
        # appends after them and is nullable (absent from earlier parts)
        assert by_name["r_regionkey"]["ordinal_position"] == 1
        assert by_name["r_name"]["ordinal_position"] == 2
        assert by_name["r_comment"]["ordinal_position"] == 3
        assert by_name["r_comment"]["is_nullable"] == "YES"
        # the homogeneous-schema fast tier (parts="first") keeps the old
        # O(tables) contract: first file's footer only
        first = information_schema_columns(spark, str(lake), parts="first").collect()
        assert {r["column_name"] for r in first} == {"r_regionkey", "r_name"}
        # the over-threshold Spark-distributed branch yields identical rows
        old_thr = cat.INFO_SCHEMA_DISTRIBUTE_THRESHOLD
        cat.INFO_SCHEMA_DISTRIBUTE_THRESHOLD = 0
        try:
            meta_d = {r["table_name"]: r for r in information_schema_tables(spark, str(lake)).collect()}
            assert meta_d == meta
            cols_d = information_schema_columns(spark, str(lake)).collect()
            assert sorted(map(tuple, cols_d)) == sorted(map(tuple, cols))
        finally:
            cat.INFO_SCHEMA_DISTRIBUTE_THRESHOLD = old_thr
        # the remote-scheme thread-pool branch yields identical rows too
        old_schemes = cat._REMOTE_SCHEMES
        cat._REMOTE_SCHEMES = ("/",)
        try:
            meta_p = {r["table_name"]: r for r in information_schema_tables(spark, str(lake)).collect()}
            assert meta_p == meta
        finally:
            cat._REMOTE_SCHEMES = old_schemes
    finally:
        cat.TABLES = old_tables


def test_catalog_columns_sees_registered_views(spark):
    register_views(spark, SF_SMOKE)
    df = catalog_columns(spark)
    got = {(r["table_name"], r["column_name"]) for r in df.collect()}
    assert ("documents", "doc_id") in got
    assert ("embeddings", "embedding") in got
    # schema-diff use case: columns in lineitem but not orders
    li = df.filter(F.col("table_name") == "lineitem").select("column_name")
    od = df.filter(F.col("table_name") == "orders").select("column_name")
    only_li = {r["column_name"] for r in li.exceptAll(od).collect()}
    assert "l_orderkey" in only_li


def test_tsv_time_column_roundtrip(spark, tmp_path):
    """TIME ingest at reference parity (SURVEY §1.2 documented divergence):
    BigQuery has a TIME type, Spark does not — the lattice maps TIME →
    StringType and the VALUES must survive the ingest verbatim (no cast
    mangling, no null-out), so a downstream user can reparse. Mixing TIME
    with DATE/TIMESTAMP values in one column resolves to STRING too."""
    p = tmp_path / "shifts.tsv"
    p.write_text(
        "shift_id\tstart_time\tmixed\n"
        "1\t09:03:22\t09:03:22\n"
        "2\t23:59:59.123456\t2020-01-02\n"
        "3\t9:3:22\t2020-01-02 13:44:50\n"
    )
    from nextgenetl_spark.sources.tsv import read_tsv

    df = read_tsv(spark, str(p))
    types = dict(df.dtypes)
    assert types["start_time"] == "string"  # TIME → STRING, documented divergence
    assert types["mixed"] == "string"  # TIME in a datetime mix → STRING
    rows = {str(r["shift_id"]): r for r in df.collect()}
    assert rows["1"]["start_time"] == "09:03:22"
    assert rows["2"]["start_time"] == "23:59:59.123456"
    assert rows["3"]["start_time"] == "9:3:22"  # verbatim, not re-rendered
    assert rows["2"]["mixed"] == "2020-01-02"


def test_table_files_lists_remote_scheme_directories(spark, tmp_path):
    """Round-9 ADVICE #2: a URI-scheme directory-backed table must
    enumerate its part files (via pyarrow.fs.FileSystem.from_uri), not
    degrade to one bare '<name>.parquet' path — otherwise the remote
    thread-pool footer tier can never see a multi-file remote lake.
    Exercised with file:// (a real pyarrow filesystem URI this box can
    serve); both INFORMATION_SCHEMA views must read every part through
    the URI paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nextgenetl_spark import catalog as cat

    lake = tmp_path / "rlake"
    part_dir = lake / "region.parquet"
    part_dir.mkdir(parents=True)
    total = 0
    for i in range(3):
        n = 2 + i
        total += n
        pq.write_table(
            pa.table(
                {
                    "r_regionkey": pa.array(range(n), type=pa.int64()),
                    "r_name": pa.array([f"r{i}_{j}" for j in range(n)]),
                }
            ),
            part_dir / f"part-{i:05d}.parquet",
        )
    (part_dir / "_SUCCESS").write_text("")  # non-parquet entries are skipped

    uri_lake = f"file://{lake}"
    files = cat._table_files(uri_lake, "region")
    assert len(files) == 3
    assert all(f.startswith("file:///") and f.endswith(".parquet") for f in files)
    assert files == sorted(files)

    # a bare single-file URI table stays a one-element list
    pq.write_table(
        pa.table({"n_nationkey": pa.array([1, 2], type=pa.int64())}),
        tmp_path / "nation.parquet",
    )
    assert cat._table_files(f"file://{tmp_path}", "nation") == [
        f"file://{tmp_path}/nation.parquet"
    ]

    old_tables = cat.TABLES
    cat.TABLES = ("region",)
    try:
        meta = {
            r["table_name"]: r
            for r in information_schema_tables(spark, uri_lake).collect()
        }
        assert meta["region"]["n_rows"] == total
        assert meta["region"]["n_columns"] == 2
        cols = information_schema_columns(spark, uri_lake).collect()
        assert {(r["column_name"], r["data_type"]) for r in cols} == {
            ("r_regionkey", "BIGINT"),
            ("r_name", "VARCHAR"),
        }
    finally:
        cat.TABLES = old_tables


def test_load_schema_cache_hits_and_invalidates(spark, tmp_path):
    """The load() schema memo must (a) return an identical DataFrame schema
    on a cache hit, (b) key on content, so an in-place regeneration of the
    table is re-inferred instead of served a stale schema."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nextgenetl_spark import catalog as cat

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    path = os.path.join(lake, "region.parquet")
    pq.write_table(
        pa.table({"r_regionkey": pa.array([1, 2], type=pa.int64())}), path
    )

    cat._SCHEMA_CACHE.clear()
    first = cat.load(spark, lake, "region")
    key = next(iter(cat._SCHEMA_CACHE))
    assert key[0] == path
    second = cat.load(spark, lake, "region")  # cache hit
    assert second.schema == first.schema
    assert [r["r_regionkey"] for r in second.orderBy("r_regionkey").collect()] == [1, 2]

    # regenerate in place with a DIFFERENT schema: the fingerprint changes,
    # so load() must re-infer, not serve the stale single-column schema
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([7], type=pa.int64()),
                "r_name": pa.array(["x"], type=pa.string()),
            }
        ),
        path,
    )
    third = cat.load(spark, lake, "region")
    assert set(third.columns) == {"r_regionkey", "r_name"}
    assert [tuple(r) for r in third.collect()] == [(7, "x")]


def test_oha_threshold_derived_from_heap():
    """The ObjectHashAggregate fallback threshold scales with the driver
    heap (1 key per 4 KiB): the measured 16g point reproduces the r11
    value exactly, smaller heaps keep a proportional OOM guard, and
    malformed/huge inputs stay bounded."""
    from nextgenetl_spark.session import _oha_fallback_threshold as t

    assert t("16g") == "4194304"       # the r11 measured point
    assert t("8g") == str(8 * 1024 * 256)
    assert t("512m") == "131072"       # floor: never the degenerate 128
    assert t("1g") == str(1024 * 256)
    assert t("256g") == str(8 * 4194304)  # cap
    assert t("weird") == "4194304"     # unparseable -> measured default


def test_schema_cache_bypasses_remote_and_bounds_per_path(spark, tmp_path):
    """URI-scheme paths must skip the local-FS fingerprint (r11 ADVICE #1
    was a FileNotFoundError before the read), and the memo bound must
    evict stale same-path entries instead of clearing hot tables."""
    from nextgenetl_spark import catalog as cat

    assert cat._schema_cache_key("s3a://bucket/t.parquet") is None
    assert cat._schema_cache_key(str(tmp_path / "missing.parquet")) is None

    cat._SCHEMA_CACHE.clear()
    from pyspark.sql import types as T

    s1 = T.StructType([T.StructField("a", T.LongType())])
    s2 = T.StructType([T.StructField("b", T.LongType())])
    cat._schema_cache_put(("/p/x", "fp1"), s1)
    cat._schema_cache_put(("/p/hot", "fph"), s1)
    cat._schema_cache_put(("/p/x", "fp2"), s2)  # same path, new content
    assert ("/p/x", "fp1") not in cat._SCHEMA_CACHE  # stale evicted
    assert cat._SCHEMA_CACHE[("/p/x", "fp2")] == s2
    assert ("/p/hot", "fph") in cat._SCHEMA_CACHE   # hot entry survives
