"""End-to-end quickstart: the path a reference (NextGenETL) user follows
after switching to this engine.

    python examples/quickstart.py          # runs against /root/testdata/sf0.001

Covers: raw-TSV ingest with reference-rule type inference + persisted
schema, the YAML-shaped step pipeline (SQL steps, materialization,
clustering, JSONL export, incremental resume), versioned publish with a
current pointer, release diff QC, and a training-data curation pass
(exact dedup → quality filter → deterministic split).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from nextgenetl_spark.catalog import load, register_views
    from nextgenetl_spark.diff import full_table_diff
    from nextgenetl_spark.operators.dedup import exact_dedup_groups
    from nextgenetl_spark.operators.sampling import deterministic_split
    from nextgenetl_spark.operators.textstats import quality_class
    from nextgenetl_spark.plans.pipeline import Pipeline
    from nextgenetl_spark.plans.publish import publish_table
    from nextgenetl_spark.sources.tsv import read_tsv

    out: dict = {}

    # 1. Raw-file ingest: TSV → inferred schema (persisted for later loads)
    tsv = os.path.join(workdir, "samples.tsv")
    with open(tsv, "w", encoding="utf-8") as fh:
        fh.write("sample_id\tdose\tresponse\n")
        for i in range(50):
            fh.write(f"S{i:03d}\t{i % 7}.5\t{'yes' if i % 3 else 'no'}\n")
    samples = read_tsv(spark, tsv, schema_path=os.path.join(workdir, "samples.schema.json"))
    out["ingest_rows"] = samples.count()

    # 2. Step pipeline over the warehouse tables (reference §3.1 shape)
    register_views(spark, sf_dir)
    wh = os.path.join(workdir, "warehouse")
    p = Pipeline(spark, params={"min_qty": 10}, warehouse=wh)
    p.register("lineitem", load(spark, sf_dir, "lineitem"))
    p.register("orders", load(spark, sf_dir, "orders"))
    cfg = {
        "steps": [
            {
                "name": "filtered",
                "dest": "big_items",
                "sql": "SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity >= {min_qty}",
                "materialize": True,
                "skip_if_fresh": True,
                "cluster_by": ["l_orderkey"],
            },
            {
                "name": "joined",
                "dest": "order_revenue",
                "sql": """SELECT o.o_orderkey, COUNT(*) AS n_items,
                                 ROUND(SUM(b.l_extendedprice), 2) AS revenue
                          FROM big_items b JOIN orders o ON b.l_orderkey = o.o_orderkey
                          GROUP BY o.o_orderkey""",
                "materialize": True,
                "export_jsonl": "order_revenue_jsonl",
            },
        ]
    }
    tables = p.run(cfg)
    out["pipeline_rows"] = tables["order_revenue"].count()

    # 3. Versioned publish with a _current pointer (skips identical releases)
    pub_root = os.path.join(workdir, "published")
    r1 = publish_table(spark, tables["order_revenue"], pub_root, "order_revenue", release="r1")
    r2 = publish_table(spark, tables["order_revenue"], pub_root, "order_revenue", release="r2")
    out["publish_r1"], out["publish_r2_skipped"] = r1["published"], not r2["published"]
    cur = spark.read.parquet(os.path.join(pub_root, "order_revenue_current"))
    out["published_rows"] = cur.count()

    # 4. Release diff QC: current vs a perturbed rebuild
    perturbed = tables["order_revenue"].withColumn(
        "revenue", F.when(F.col("o_orderkey") % 97 == 0, F.col("revenue") + 1).otherwise(F.col("revenue"))
    )
    out["diff_rows"] = full_table_diff(cur, perturbed).count()

    # 5. Training-data curation: dedup → quality → deterministic split
    docs = load(spark, sf_dir, "documents")
    keep = exact_dedup_groups(docs).select(F.col("canonical_id").alias("doc_id"))
    curated = (
        docs.join(keep, "doc_id")
        .withColumn("quality", quality_class("text"))
        .filter(F.col("quality") != "too_short")
    )
    split = deterministic_split(curated, "doc_id", [("cccc", "train"), ("e666", "val")])
    out["split_counts"] = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    # 6. Mergeable-sketch QC pass: a Bloom membership gate against the
    # already-curated history, and per-corpus value quantiles from the
    # QHIST table — both sketches are plain SQL-mergeable tables, so a
    # daily pipeline unions them instead of re-scanning the corpus.
    from nextgenetl_spark.operators.agg import (
        bloom_build, bloom_might_contain, qhist_build, qhist_quantiles,
    )

    fp = docs.select("doc_id", F.md5("text").alias("f"))
    bloom = bloom_build(fp.join(keep, "doc_id"), "f", m_bits=4096, k_hashes=4)
    gate = bloom_might_contain(bloom, fp, "f", m_bits=4096, k_hashes=4)
    out["bloom_definitely_new"] = gate.filter(~F.col("might_contain")).count()
    lens = docs.select(F.length("text").cast("double").alias("value"))
    qh = qhist_build(lens, "value", lo=0.0, hi=4096.0, n_bins=128)
    out["len_p50_p95"] = [
        r["value"] for r in qhist_quantiles(qh, [0.5, 0.95], 0.0, 4096.0, 128).orderBy("q").collect()
    ]
    return out


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as wd:
        print(main(spark, "/root/testdata/sf0.001", wd))
