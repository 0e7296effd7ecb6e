"""End-to-end ×N dedup pipeline at DEFAULT heap — round-5 verdict ask #6.

Round-5's §4.2 curves measured the two halves separately (94.4s pair
materialization, then a 25-32s CC solve over checkpointed pairs). This
runs the COMPOSED pipeline — minhash-LSH pairs → connected components →
keep-list (min doc_id per component) → survivor count — as ONE plan
under the default 8 GB driver heap, and records wall + spill via the UI
REST API, so the datapoint shows the full production shape: nothing is
pre-materialized, the pair stream feeds the iterative solver directly,
and the solver's DISK_ONLY checkpoints (the round-5 ×100 OOM fix) bound
heap at any edge volume.

    python tools/dedup_pipeline_bench.py [factor] [cc_variant]
      factor      in-plan corpus replication (default 100 → 500k docs)
      cc_variant  min_label | star (default both)

Prints one JSON line; the BASELINE §4.2 composed-pipeline row comes
from this.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from nextgenetl_spark.catalog import load
from nextgenetl_spark.operators import dedup as D


def _ui_spark():
    """Engine-default-heap session (8g, session.py's default — overridable
    via SPARK_GRAFT_DRIVER_MEM) with the UI on for spill metrics."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    parts = int(cpus) if cpus else (os.cpu_count() or 8)
    return (
        SparkSession.builder.appName("dedup-pipeline-bench")
        .master(master)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "500")
        # the engine's default heap (session.py): the round-5 OOM-fix
        # claim under test is "DISK_ONLY checkpoints bound heap at any
        # edge volume AT the 8g default" — bare local-mode 1g is not the
        # deployment shape (a real executor has several GB)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def _spill(spark, min_stage_id):
    import urllib.request

    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=COMPLETE"))
    mem = disk = 0
    for s in stages:
        if s["stageId"] >= min_stage_id:
            mem += s.get("memoryBytesSpilled", 0)
            disk += s.get("diskBytesSpilled", 0)
    return {"memory_spilled_mb": mem // 2**20, "disk_spilled_mb": disk // 2**20}


def replicate_docs(d, n):
    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    return d.select("*", rep).select(
        (F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.col("rep").cast("string")).alias("text"),
        "source",
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    variants = sys.argv[2:] or ["min_label", "star"]
    spark = _ui_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d = replicate_docs(load(spark, sf, "documents"), factor)
    n_docs = d.count()
    out = {
        "factor": factor,
        "n_docs": n_docs,
        "heap_max_mb": int(
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory() // 2**20
        ),
    }
    for variant in variants:
        solver = D.connected_components if variant == "min_label" else D.connected_components_star
        s0 = int(spark.sparkContext._jsc.sc().dagScheduler().nextStageId())
        t0 = time.time()
        # ONE composed plan: pairs are never materialized or counted
        # separately — the LSH pair stream feeds the solver directly and
        # the keep-list anti-join consumes the component map.
        pairs = D.minhash_near_dup_pairs(d, threshold=0.5).select("a_id", "b_id")
        comp = solver(pairs)  # (node, label); label = component min id
        # label IS the component's canonical minimum id, so the keep-list
        # is just node != label: every non-representative dup-group member
        drop = comp.filter(F.col("node") != F.col("label")).select("node")
        survivors = d.join(drop, d["doc_id"] == drop["node"], "left_anti")
        n_surv = survivors.count()
        wall = round(time.time() - t0, 2)
        out[variant] = {
            "wall_s": wall,
            "survivors": n_surv,
            "dropped": n_docs - n_surv,
            **_spill(spark, s0),
        }
        print(f"  {variant}: {wall}s, {n_surv} survivors", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
