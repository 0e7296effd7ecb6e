"""Single-process wall timer for registry entries, for CROSS-PROCESS
interleaved A/B of session-level knobs (driver heap, OHA threshold, GC):
those cannot change inside a live JVM, so the bisect runs this script once
per (config, rep) and interleaves at the process level, taking per-config
mins (the box-noise protocol). Prints one JSON line.

    SPARK_GRAFT_DRIVER_MEM=8g python tools/query_wall.py basket_pairs 3
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.workloads import load_all


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    mode = bench.HEADLINE.get(name, "count")
    registry = load_all()
    fn = registry[name].fn
    spark = get_spark("query_wall")
    spark.range(1000).selectExpr("sum(id)").collect()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        if mode == "collect":
            df.collect()
        else:
            df.count()
        runs.append(round(time.time() - t0, 3))
        del df
    print(json.dumps({
        "query": name,
        "runs": runs,
        "min": min(runs),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", ""),
        "oha": os.environ.get("SPARK_GRAFT_OHA_FALLBACK", ""),
    }))


if __name__ == "__main__":
    main()
