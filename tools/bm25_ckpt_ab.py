"""Interleaved A/B: bm25_multi_scores' duplicated tokenize subtrees vs two
small lazy localCheckpoints (dl, tf) that dedupe them inside one action
(guide §5 lineage-cut; no new shuffle — both tables are the small side of
their joins). Outputs asserted identical before timing. Times the full
hybrid lexical leg (the hybrid_rrf_* consumer shape) and the raw score
table. Usage: python tools/bm25_ckpt_ab.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.operators.textstats import bm25_multi_scores, tokens


def bm25_multi_scores_ckpt(
    df, query_terms, text_col="text", id_col="doc_id", query_id="query_id",
    term_col="term", k1=1.2, b=0.75, part_dp=6,
):
    """bm25_multi_scores with dl and tf lazily checkpointed — body otherwise
    verbatim from operators/textstats.py."""
    toks = df.select(id_col, F.explode(tokens(text_col)).alias(term_col))
    dl = (
        toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
        .localCheckpoint(eager=False)
    )
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    vocab = query_terms.select(term_col).distinct()
    tf = (
        toks.join(F.broadcast(vocab), term_col, "semi")
        .groupBy(id_col, term_col)
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    part = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(
            F.broadcast(query_terms.select(query_id, term_col).distinct()), term_col
        )
        .join(F.broadcast(dfreq), term_col)
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    if part_dp is None:
        return scored.groupBy(query_id, id_col).agg(F.sum(part).alias("score"))
    scale = float(10 ** part_dp)
    q = F.round(part * scale, 0).cast("long")
    return scored.groupBy(query_id, id_col).agg((F.sum(q) / scale).alias("score"))


def lex_leg(docs, impl, k=10):
    qterms = (
        docs.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("query_id"), F.explode(tokens("text")).alias("term"))
        .distinct()
    )
    lexscore = impl(docs, qterms, part_dp=6).filter(F.col("query_id") != F.col("doc_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        lexscore.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bm25_ckpt_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = load(spark, sf, "documents")

    a = sorted(map(tuple, lex_leg(docs, bm25_multi_scores).collect()))
    b = sorted(map(tuple, lex_leg(docs, bm25_multi_scores_ckpt).collect()))
    assert a == b, "checkpointed variant diverges!"
    print("identical:", len(a), "rows")

    walls = {"A_current": [], "B_ckpt": []}
    for _ in range(reps):
        t0 = time.time()
        lex_leg(docs, bm25_multi_scores).collect()
        walls["A_current"].append(round(time.time() - t0, 3))
        t0 = time.time()
        lex_leg(docs, bm25_multi_scores_ckpt).collect()
        walls["B_ckpt"].append(round(time.time() - t0, 3))
    for k, w in walls.items():
        print(f"{k:10s} min {min(w):6.3f}  runs {w}")


if __name__ == "__main__":
    main()
