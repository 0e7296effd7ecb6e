"""Measure repartition-after-read (guide SS2.5 unsplittable-input fix) on
single-row-group inputs, for a heavy-first-stage query (wide140) and the
flagship scan-agg (pricing_summary shape)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.workloads.relational import _wide140_formulas

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("prof-spread")
spark.range(1000).selectExpr("sum(id)").collect()
P = spark.sparkContext.defaultParallelism
print("defaultParallelism:", P)

li = load(spark, SF, "lineitem")


def wide140(src):
    cols = [expr() for _, expr, _ in _wide140_formulas()]
    wide = src.select(*cols, "l_orderkey")
    group_cols = [name for name, _, _ in _wide140_formulas()]
    return wide.groupBy(*group_cols).agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("l_orderkey").cast("string"))), ";"
        ).alias("pooled_ids"),
        F.count(F.lit(1)).alias("n_pooled"),
    )


def pricing(src):
    return (
        src.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def run(label, mk, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        mk().count()
        walls.append(round(time.time() - t0, 2))
    print(f"{label:44s} {walls}", flush=True)


run("wide140 plain", lambda: wide140(li))
run("wide140 repartition(P) after read", lambda: wide140(li.repartition(P)))
run("pricing plain", lambda: pricing(li))
run("pricing repartition(P) after read", lambda: pricing(li.repartition(P)))
print("repartition-only cost:")
run("li.repartition(P) noop-ish count", lambda: li.repartition(P))
