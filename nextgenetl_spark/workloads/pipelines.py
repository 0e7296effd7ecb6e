"""Pipeline-harness workloads (SURVEY.md §3) — the reference's dominant
entry point, exercised inside the driver's oracle gate rather than only in
pytest.

``pipeline_chain`` runs a real YAML config through ``plans.pipeline`` (params
substitution, named-table step chaining, CLUSTER BY rewrite, per-step
materialization — reference: common_etl/utils.py:2099-2162 load_config,
common_etl/support.py:775-821 generic_bq_harness, :1148-1160 cluster rewrite).
``publish_current`` runs the §3.4 compare-then-publish tail (reference:
common_etl/support.py:2025-2123) and returns the ``_current`` table.
"""

from __future__ import annotations

import tempfile

import yaml

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextgenetl_spark.catalog import load
from nextgenetl_spark.plans.pipeline import Pipeline
from nextgenetl_spark.plans.publish import publish_table
from nextgenetl_spark.workloads import workload

_PIPELINE_YAML = """
params:
  min_size: 15
  brand_prefix: "Brand#1"
steps:
  - name: filtered_parts
    dest: filtered_parts
    sql: >
      SELECT p_partkey, p_brand FROM part
      WHERE p_size >= {min_size} AND p_brand LIKE '{brand_prefix}%'
  - name: part_sales
    dest: part_sales
    sql: >
      SELECT f.p_brand, l.l_quantity, l.l_extendedprice
      FROM filtered_parts f JOIN lineitem l ON f.p_partkey = l.l_partkey
    cluster_by: [p_brand]
    materialize: true
  - name: brand_rollup
    dest: brand_rollup
    sql: >
      SELECT p_brand, ROUND(SUM(l_quantity), 2) AS qty,
             ROUND(SUM(l_extendedprice), 2) AS revenue, COUNT(*) AS n
      FROM part_sales GROUP BY p_brand
"""


@workload(
    "pipeline_chain",
    oracle="""
    WITH filtered_parts AS (
        SELECT p_partkey, p_brand FROM part
        WHERE p_size >= 15 AND p_brand LIKE 'Brand#1%'
    ),
    part_sales AS (
        SELECT f.p_brand, l.l_quantity, l.l_extendedprice
        FROM filtered_parts f JOIN lineitem l ON f.p_partkey = l.l_partkey
    )
    SELECT p_brand, ROUND(SUM(l_quantity), 2) AS qty,
           ROUND(SUM(l_extendedprice), 2) AS revenue, COUNT(*) AS n
    FROM part_sales GROUP BY p_brand
    """,
)
def pipeline_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step YAML pipeline: param-substituted filter → clustered +
    materialized join → rollup, chained by table name exactly as the
    reference's step loop does. The materialize step is the reference's
    per-step WRITE_TRUNCATE barrier; the non-materialized steps fuse into
    one Catalyst plan. At 100 TB the materialization doubles as the
    resume/inspect point and a reusable shuffle barrier."""
    cfg = yaml.safe_load(_PIPELINE_YAML)
    pipe = Pipeline(spark, warehouse=tempfile.mkdtemp(prefix="ngetl_wh_"))
    pipe.register("part", load(spark, sf_dir, "part"))
    pipe.register("lineitem", load(spark, sf_dir, "lineitem"))
    out = pipe.run(cfg)
    return out["brand_rollup"]


@workload(
    "publish_current",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def publish_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compare-then-publish tail (§3.4): release r1 (orders before 1997) is
    published, r2 (full corpus, changed data) supersedes it, then an
    identical r3 is correctly skipped — and the ``_current`` parquet is
    returned. Compares run as EXCEPT-DISTINCT-style diffs (diff.tables_equal),
    so 'unchanged' costs two aggregates, never a row-by-row driver loop."""
    o = load(spark, sf_dir, "orders")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )

    root = tempfile.mkdtemp(prefix="ngetl_pub_")
    r1 = profile(o.filter(F.year("o_orderdate") < 1997))
    publish_table(spark, r1, root, "order_profile", "r1")
    r2 = profile(o)
    res2 = publish_table(spark, r2, root, "order_profile", "r2")
    res3 = publish_table(spark, r2, root, "order_profile", "r3")
    if not res2["published"] or res3["published"]:
        raise AssertionError(f"publish tail misbehaved: r2={res2} r3={res3}")
    return spark.read.parquet(f"{root}/order_profile_current")
