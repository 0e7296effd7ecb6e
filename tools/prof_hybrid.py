"""One-off profiling harness for hybrid_rrf_production (guide §1: isolate
each expensive stage with the noop sink so we time computation, not sinks)."""
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


spark = get_spark("prof-hybrid")
spark.range(1000).selectExpr("sum(id)").collect()

emb = load(spark, SF, "embeddings")
docs = load(spark, SF, "documents")

from nextgenetl_spark.operators.similarity import ivfpq_topk
from nextgenetl_spark.workloads.similarity import _hybrid_lex_leg
from nextgenetl_spark.operators.textstats import rrf_fuse

q_emb = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
c_emb = emb.select(F.col("vec_id").alias("doc_id"), "embedding")

for rep in range(2):
    spark.sparkContext.setJobDescription(f"dense leg rep{rep}")
    timed(f"dense ivfpq_topk (all-auto) rep{rep}", lambda: noop(
        ivfpq_topk(q_emb, c_emb, k_centroids=16, nprobe=None, m=8, ks=16, k=10,
                   shortlist=None, refine_iters=1, train_iters=1, corpus_id="doc_id")))
    spark.sparkContext.setJobDescription(f"lex leg rep{rep}")
    timed(f"lex leg rep{rep}", lambda: noop(_hybrid_lex_leg(docs)))
    spark.sparkContext.setJobDescription(f"full rep{rep}")
    timed(f"full fusion rep{rep}", lambda: noop(rrf_fuse(
        [ivfpq_topk(q_emb, c_emb, k_centroids=16, nprobe=None, m=8, ks=16, k=10,
                    shortlist=None, refine_iters=1, train_iters=1,
                    corpus_id="doc_id").select("query_id", "doc_id", "rank"),
         _hybrid_lex_leg(docs)], k=5)))
