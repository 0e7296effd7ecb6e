"""Job-level profiling of the IVF-PQ build walk (guide §1/§7): event-log
every Spark job with wall, task time, task count, and the DRIVER GAPS
between jobs (planning/codegen/py4j) that per-phase wall timing hides."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

EVDIR = "/tmp/spark-events"
os.makedirs(EVDIR, exist_ok=True)
os.environ.setdefault("SPARK_GRAFT_EXTRA_CONF", "")

from nextgenetl_spark.session import get_spark  # noqa: E402

# piggyback event-log config through a fresh builder (same factory settings)
from pyspark.sql import SparkSession  # noqa: E402

builder_spark = get_spark  # keep import used


def get_spark_ev(name):
    from nextgenetl_spark import session as S

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    sp = int(cpus) if cpus else (os.cpu_count() or 8)
    b = (
        SparkSession.builder.appName(name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", S._default_driver_mem()))
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
    )
    return b.getOrCreate()


SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark_ev("prof-jobs")
spark.range(1000).selectExpr("sum(id)").collect()

from nextgenetl_spark.catalog import load  # noqa: E402
from nextgenetl_spark.operators.similarity import ivfpq_topk  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


emb = load(spark, SF, "embeddings")
q_emb = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
c_emb = emb.select(F.col("vec_id").alias("doc_id"), "embedding")

# warm rep first (codegen caches), then the measured rep
for rep in range(2):
    spark.sparkContext.setJobDescription(f"ivfpq rep{rep}")
    t0 = time.time()
    noop(
        ivfpq_topk(q_emb, c_emb, k_centroids=16, nprobe=None, m=8, ks=16, k=10,
                   shortlist=None, refine_iters=1, train_iters=1, corpus_id="doc_id")
    )
    print(f"rep{rep} wall {time.time()-t0:.2f}s", flush=True)

app_id = spark.sparkContext.applicationId
spark.stop()
time.sleep(1)

# parse the event log
path = sorted(glob.glob(os.path.join(EVDIR, app_id + "*")))[-1]
jobs = {}
stages = {}
with open(path) as fh:
    for line in fh:
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get("spark.job.description", ""),
                "stages": ev.get("Stage IDs", []),
            }
        elif e == "SparkListenerJobEnd":
            jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "tasks": si["Number of Tasks"],
                "sub": si.get("Submission Time"),
                "done": si.get("Completion Time"),
            }

prev_end = None
print(f"\n{'job':>4} {'wall_ms':>8} {'gap_ms':>7} {'ntask':>5}  first-stage / desc")
tot_wall = tot_gap = 0
for jid in sorted(jobs):
    j = jobs[jid]
    if "end" not in j:
        continue
    wall = j["end"] - j["start"]
    gap = (j["start"] - prev_end) if prev_end is not None else 0
    prev_end = j["end"]
    ntask = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"])
    sname = stages.get(j["stages"][0], {}).get("name", "?") if j["stages"] else "?"
    if "rep1" in j["desc"]:
        tot_wall += wall
        tot_gap += gap
    print(f"{jid:>4} {wall:>8} {gap:>7} {ntask:>5}  {sname} | {j['desc'][:30]}")
print(f"\nrep1 totals: job-wall {tot_wall} ms, inter-job gaps {tot_gap} ms")
