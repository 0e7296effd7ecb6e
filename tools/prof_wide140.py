"""Profile wide_group_dedup_140 variants (guide §1 measure-first)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.workloads.relational import _wide140_formulas

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("prof-wide140")
spark.range(1000).selectExpr("sum(id)").collect()

li = load(spark, SF, "lineitem")
print("lineitem rows:", li.count())
print("distinct (pk,sk,rf):", li.select("l_partkey", "l_suppkey", "l_returnflag").distinct().count())


def current():
    cols = [expr() for _, expr, _ in _wide140_formulas()]
    wide = li.select(*cols, "l_orderkey")
    group_cols = [name for name, _, _ in _wide140_formulas()]
    return wide.groupBy(*group_cols).agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("l_orderkey").cast("string"))), ";"
        ).alias("pooled_ids"),
        F.count(F.lit(1)).alias("n_pooled"),
    )


def twolevel():
    lvl1 = li.groupBy("l_partkey", "l_suppkey", "l_returnflag").agg(
        F.collect_set(F.col("l_orderkey").cast("string")).alias("__ids"),
        F.count(F.lit(1)).alias("__n"),
    )
    cols = [expr() for _, expr, _ in _wide140_formulas()]
    wide = lvl1.select(*cols, "__ids", "__n")
    group_cols = [name for name, _, _ in _wide140_formulas()]
    return wide.groupBy(*group_cols).agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("__ids")))), ";"
        ).alias("pooled_ids"),
        F.sum("__n").alias("n_pooled"),
    )


def run(label, mk):
    for rep in range(2):
        t0 = time.time()
        mk().count()
        print(f"{label} rep{rep}: {time.time()-t0:7.2f}s", flush=True)


run("current (threshold default)", current)
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8388608")
run("current (threshold 8M)", current)
run("twolevel (threshold 8M)", twolevel)
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
run("twolevel (threshold default)", twolevel)
