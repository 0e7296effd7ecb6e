"""Measured memory-pressure (spill) experiment: prove the engine's wide
shuffle/sort/agg plans DEGRADE TO DISK instead of dying when the working
set exceeds executor memory — the behavior a 100-TB run depends on and the
one a 128 GiB sandbox never triggers by accident.

Builds a ~TOTAL_MB working set in-plan (lineitem replicated with a padded
payload), runs the two classic spillers under a deliberately small heap —
a global sort (range-partitioned external sort) and a high-cardinality
hash aggregation (hash map falls back to sort-based agg) — and reports
wall time plus memory/disk spill bytes from the stage metrics REST API.

    python tools/spill_bench.py [heap_gb] [replication]   # default 3 40

Run it as its own process (the small heap must be set at JVM launch).
Prints one JSON line; BASELINE §4.5 records the datapoint.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def _spark(heap_gb: int):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    parts = int(cpus) if cpus else (os.cpu_count() or 8)
    return (
        SparkSession.builder.appName("spill-bench")
        .master(master)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", f"{heap_gb}g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _spill_metrics(spark, min_stage_id):
    import urllib.request

    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=COMPLETE"))
    mem = disk = 0
    for s in stages:
        if s["stageId"] >= min_stage_id:
            mem += s.get("memoryBytesSpilled", 0)
            disk += s.get("diskBytesSpilled", 0)
    return {"memory_spilled_mb": mem // 2**20, "disk_spilled_mb": disk // 2**20}


def main():
    heap_gb = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = _spark(heap_gb)
    sf = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    big = li.select("*", rep).select(
        (F.col("l_orderkey") * n + F.col("rep")).alias("k"),
        F.rpad(F.concat_ws("#", "l_partkey", "l_suppkey"), 180, "x").alias("payload"),
    )
    out = {"heap_gb": heap_gb, "replication": n}

    sc = spark.sparkContext

    def stage_floor():
        return int(sc._jsc.sc().dagScheduler().nextStageId())

    # 1. global sort: range partition + per-partition external sort.
    # The noop sink executes the full sorted plan and discards rows —
    # a bare count() would let Catalyst eliminate the sort entirely.
    # rows is counted BEFORE the metrics window opens: the dict-literal
    # form evaluated big.count() inside [s0, now), polluting the reported
    # sort spill bytes with the count job's stages (round-5 ADVICE).
    rows = big.count()
    s0 = stage_floor()
    t0 = time.time()
    big.orderBy("payload", "k").write.format("noop").mode("overwrite").save()
    wall = round(time.time() - t0, 2)
    out["global_sort"] = {"wall_s": wall, "rows": rows, **_spill_metrics(spark, s0)}

    # 2. high-cardinality hash agg (every key distinct => map exceeds heap)
    s0 = stage_floor()
    t0 = time.time()
    agg_rows = big.groupBy("k", "payload").agg(F.count(F.lit(1))).count()
    out["wide_hash_agg"] = {
        "wall_s": round(time.time() - t0, 2),
        "groups": agg_rows,
        **_spill_metrics(spark, s0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
