"""Stage-level profiling of the self-contained ivfpq_topk path (guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label:40s} {time.time()-t0:7.2f}s", flush=True)
    return out


spark = get_spark("prof-ivfpq")
spark.range(1000).selectExpr("sum(id)").collect()

from nextgenetl_spark.operators.similarity import (
    pick_centroids, refine_centroids, assign_cells, train_pq_codebooks,
    _collect_codebooks, pq_encode, _unit_vectors, measured_adc_crowd,
    _auto_shortlist, _auto_nprobe,
)

emb = load(spark, SF, "embeddings")
print("corpus rows:", emb.count())
corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
corpus_id, vec_col = "doc_id", "embedding"
k_centroids, m, ks, k = 16, 8, 16, 10

for rep in range(2):
    cents = timed(f"pick+refine centroids rep{rep}", lambda: refine_centroids(
        corpus, pick_centroids(corpus, k_centroids, corpus_id, vec_col), 1,
        corpus_id, vec_col).localCheckpoint())
    cells = assign_cells(corpus, cents, corpus_id, vec_col).select(corpus_id, "cell_id")
    timed(f"assign_cells (noop) rep{rep}", lambda: noop(cells))
    cb = timed(f"train_pq_codebooks rep{rep}", lambda: train_pq_codebooks(
        corpus, m, ks, 1, corpus_id, vec_col))
    CB = timed(f"collect codebooks rep{rep}", lambda: _collect_codebooks(cb, m, ks))
    codes = pq_encode(corpus, CB, corpus_id, vec_col).join(cells, corpus_id)
    timed(f"pq_encode+join (noop) rep{rep}", lambda: noop(codes))
    unit = _unit_vectors(corpus, corpus_id, vec_col)
    crowd = timed(f"measured_adc_crowd rep{rep}", lambda: measured_adc_crowd(
        unit, codes, CB, corpus_id, count_fraction=None))
    print("  crowd =", crowd, "shortlist =", _auto_shortlist(k, crowd))
