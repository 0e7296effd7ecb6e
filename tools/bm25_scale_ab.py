"""bm25 plan-shape decision at blow-up scale (r12 verdict ask #7).

The shipped bm25_scores/bm25_multi_scores tokenize the corpus once per
CONSUMER subtree (dl pass + tf pass -> 2 scans + 2 explodes in one plan);
the rejected r11 restructure computes ONE (id, term, tf) posting aggregate
that both consumers read (1 tokenize + 1 corpus-vocabulary shuffle, with
ReuseExchange collapsing the two posting reads onto one exchange). At
sf0.1 the duplicated scans won (2.4s vs 3.5s warm); this harness decides
the shape at Nx corpus blow-up, where tokenize CPU scales with N on both
arms but the posting shuffle's bytes scale with N only on arm B.

Builds an Nx documents blow-up in /tmp (doc_id offset per copy, text
unchanged -> N disjoint sf0.1-shaped corpora; cached, _SUCCESS-marked),
asserts both arms produce IDENTICAL rows at the blown-up scale, then
interleaves min-of-R walls for both arms of bm25_multi_scores (the
hybrid lexical-leg regime: 5 query docs' distinct tokens).

    python tools/bm25_scale_ab.py [mult] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from nextgenetl_spark.session import get_spark
from nextgenetl_spark.catalog import load
from nextgenetl_spark.operators.textstats import bm25_multi_scores, tokens

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def bm25_multi_posting(
    df: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    term_col: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    part_dp: int | None = 6,
) -> DataFrame:
    """Arm B: one (id, term, tf) posting aggregate feeding BOTH dl and tf —
    1 tokenize scan + 1 corpus-vocabulary shuffle (ReuseExchange collapses
    the two posting reads). Identical math to bm25_multi_scores: dl is the
    SUM of per-term tfs (= token count), everything downstream verbatim."""
    toks = df.select(id_col, F.explode(tokens(text_col)).alias(term_col))
    posting = toks.groupBy(id_col, term_col).agg(F.count(F.lit(1)).alias("tf"))
    dl = posting.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    vocab = query_terms.select(term_col).distinct()
    tf = posting.join(F.broadcast(vocab), term_col, "semi")
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


def blowup_docs(spark, mult: int) -> str:
    src = os.path.join(SF_DIR, "documents.parquet")
    out = f"/tmp/ngetl_bm25_scale_{mult}x"
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    d = spark.read.parquet(src)
    n = d.agg(F.max("doc_id")).first()[0] + 1
    stride = int(n)
    copies = d.select(
        (F.col("doc_id") + F.lit(0)).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    union = None
    for k in range(mult):
        c = d.select(
            (F.col("doc_id") + F.lit(k * stride)).cast("long").alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        union = c if union is None else union.unionAll(c)
    union.repartition(32).write.mode("overwrite").parquet(out)
    return out


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bm25_scale_ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    path = blowup_docs(spark, mult)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    qterms = (
        docs.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("query_id"), F.explode(tokens("text")).alias("term"))
        .distinct()
    )

    a_rows = sorted(map(tuple, bm25_multi_scores(docs, qterms, part_dp=6).collect()))
    b_rows = sorted(map(tuple, bm25_multi_posting(docs, qterms, part_dp=6).collect()))
    assert a_rows == b_rows, "posting arm diverges from shipped shape!"

    walls = {"A_dup_scans": [], "B_posting": []}
    for _ in range(reps):
        t0 = time.time()
        bm25_multi_scores(docs, qterms, part_dp=6).count()
        walls["A_dup_scans"].append(round(time.time() - t0, 3))
        t0 = time.time()
        bm25_multi_posting(docs, qterms, part_dp=6).count()
        walls["B_posting"].append(round(time.time() - t0, 3))
    print(json.dumps({
        "mult": mult, "n_docs": n_docs, "n_result_rows": len(a_rows),
        "identical": True,
        "A_dup_scans": {"min": min(walls["A_dup_scans"]), "runs": walls["A_dup_scans"]},
        "B_posting": {"min": min(walls["B_posting"]), "runs": walls["B_posting"]},
    }))


if __name__ == "__main__":
    main()
