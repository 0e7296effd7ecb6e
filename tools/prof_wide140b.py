"""wide140 variant matrix at 32g heap: repartition x fallbackThreshold."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.workloads.relational import _wide140_formulas

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof-wide140b")
spark.range(1000).selectExpr("sum(id)").collect()
P = spark.sparkContext.defaultParallelism
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


def loadavg():
    with open("/proc/loadavg") as fh:
        return fh.read().split()[0]


def run(label, mk, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        mk().count()
        walls.append(round(time.time() - t0, 2))
    print(f"{label:52s} {walls}  load={loadavg()}", flush=True)


for thr in ["128", "8388608"]:
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
    run(f"plain thr={thr}", lambda: wide140(li))
    run(f"repart thr={thr}", lambda: wide140(li.repartition(P)))
