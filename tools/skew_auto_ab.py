"""A/B for the CMS-driven automatic skew decision (round-10 verdict ask #4).

Reuses tools/skew_bench.py's pathological fixture (lineitem replicated ×N,
one hot key at ~40% of rows, ~50k cold keys, broadcast disabled so the
fact-dim join pays the skewed SMJ shuffle) plus a UNIFORM twin (same row
count, no hot key), and races four regimes on each:

    plain        ordinary join, AQE skew OFF
    salted       hand-tuned operators/joins.py salted_join (32 salts)
    auto         operators/joins.py salted_join_auto end-to-end — builds
                 the big side's CMS sketch, takes the skew_decision, runs
                 whichever branch it chose (wall INCLUDES sketch+decision)
    auto_f10     same, but the inline sketch reads a 10% Bernoulli row
                 sample (sample_fraction=0.1) — the cheap inline path
    auto_staged  salted_join_auto with a PRE-BUILT sketch (the 100-TB
                 ingest-artifact shape — decision cost only)

Each regime also records the reduce-task skew (max vs median task wall of
the heaviest shuffle-read stage, via the UI REST API) — on local[32] the
straggler timeshares a core so WALLS barely move, but task_max/task_p50 is
what becomes the wall on a real cluster (the skew_bench.py metric).

Done-bar from the verdict: the auto decision must MATCH the hand-tuned
choice on both fixtures (salt on the hot one, plain on the uniform one)
and its wall must track the matching hand regime. Writes SKEW_AUTO_AB.json.

    python tools/skew_auto_ab.py [replication]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.skew_bench import (
    N_COLD_KEYS,
    _reduce_task_skew,
    _ui_spark,
    build_dim,
    build_fact,
)
from nextgenetl_spark.operators.agg import cms_build
from nextgenetl_spark.operators.joins import salted_join, salted_join_auto


def build_uniform_fact(spark, sf_dir, n):
    from nextgenetl_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    rep = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("rep")
    fact = li.select("*", rep)
    key = (F.rand(seed=11) * N_COLD_KEYS).cast("long") + 1
    return fact.select(key.alias("k"), "l_quantity")


def timed(spark, fn, repeats=2):
    walls, out, tasks = [], None, None
    for _ in range(repeats):
        next_stage = int(spark.sparkContext._jsc.sc().dagScheduler().nextStageId())
        t0 = time.time()
        out = fn()
        walls.append(round(time.time() - t0, 2))
        try:
            tasks = _reduce_task_skew(spark, next_stage) or tasks
        except Exception:
            pass
    return min(walls), out, tasks


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = _ui_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = {"replication": n, "sf_dir": sf_dir, "n_cold_keys": N_COLD_KEYS}
    dim = build_dim(spark).localCheckpoint()
    for label, fact_df in (
        ("skewed_40pct_hot", build_fact(spark, sf_dir, n)),
        ("uniform", build_uniform_fact(spark, sf_dir, n)),
    ):
        fact = fact_df.localCheckpoint()
        rows = fact.count()
        entry: dict = {"fact_rows": rows}

        def agg_count(df):
            return df.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt")).count()

        entry["plain_wall_s"], _, entry["plain_tasks"] = timed(
            spark, lambda: agg_count(fact.join(dim, "k"))
        )
        entry["salted_wall_s"], _, entry["salted_tasks"] = timed(
            spark, lambda: agg_count(salted_join(fact, dim, on="k", num_salts=32))
        )

        def run_auto(cms=None, frac=None):
            dec: dict = {}
            df = salted_join_auto(
                fact, dim, "k", num_salts=32, cms_big=cms, decision_out=dec,
                sample_fraction=frac,
            )
            return agg_count(df), dec

        entry["auto_wall_s"], (_, dec), entry["auto_tasks"] = timed(
            spark, lambda: run_auto()
        )
        entry["auto_decision"] = dec
        entry["auto_f10_wall_s"], (_, dec_f), _ = timed(
            spark, lambda: run_auto(frac=0.1)
        )
        entry["auto_f10_decision"] = dec_f

        staged = cms_build(
            fact.select(F.col("k").cast("string").alias("k")), "k"
        ).localCheckpoint()
        entry["auto_staged_wall_s"], (_, dec_s), entry["auto_staged_tasks"] = timed(
            spark, lambda: run_auto(staged)
        )
        entry["auto_staged_decision"] = dec_s

        hand_choice = "salted" if label.startswith("skewed") else "plain"
        entry["hand_tuned_choice"] = hand_choice
        entry["auto_matches_hand"] = dec["salt"] == (hand_choice == "salted")
        report[label] = entry
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_AUTO_AB.json",
    )
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
