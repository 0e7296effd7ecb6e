"""Profile the streaming replay family: where do the seconds go?
Prints each micro-batch's durationMs from recentProgress."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nextgenetl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("prof-stream")
spark.range(1000).selectExpr("sum(id)").collect()

from nextgenetl_spark.streaming.source import events_stream, replay_shuffle_cap
from nextgenetl_spark.streaming.windows import session_window_agg, with_watermark


def one(name, rep):
    agg = session_window_agg(with_watermark(events_stream(spark, SF)), gap="30 minutes")
    t0 = time.time()
    with replay_shuffle_cap(spark, 16):
        q = (
            agg.writeStream.format("memory")
            .queryName(f"{name}_{rep}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
    wall = time.time() - t0
    n = spark.table(f"{name}_{rep}").count()
    print(f"rep{rep}: wall={wall:6.2f}s rows={n}", flush=True)
    for p in q.recentProgress:
        print("  batch", p["batchId"], "numInputRows", p["numInputRows"],
              "durationMs", json.dumps(p["durationMs"]),
              "stateOperators", [
                  {k: so.get(k) for k in ("numRowsTotal", "commitTimeMs",
                                          "stateMemory", "numStateStoreInstances")}
                  for so in p.get("stateOperators", [])], flush=True)


print("tmpdir:", os.environ.get("TMPDIR", "(default /tmp)"))
for rep in range(3):
    one("prof_sess", rep)
