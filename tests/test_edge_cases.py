"""Empty-input and degenerate-input robustness: every core operator must
return an empty (or correctly degenerate) result, not crash, when a filter
upstream leaves zero rows — the situation every scheduled pipeline
eventually hits on a quiet day."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextgenetl_spark.operators import dedup as D


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, source string")


def test_dedup_operators_on_empty_input(spark):
    e = _empty_docs(spark)
    assert D.exact_dedup_groups(e).count() == 0
    assert D.minhash_near_dup_pairs(e).count() == 0
    assert D.md5_minhash_near_dup_pairs(e).count() == 0
    assert D.simhash_fingerprints(e).count() == 0
    assert D.md5_simhash_fingerprints(e).count() == 0
    assert D.ngram_jaccard_pairs(e, "source").count() == 0
    assert D.near_dup_pairs_auto(e, "source").count() == 0


def test_connected_components_on_empty_edges(spark):
    edges = spark.createDataFrame([], "a_id long, b_id long")
    assert D.connected_components(edges).count() == 0
    assert D.connected_components_star(edges).count() == 0


def test_similarity_on_empty_corpus_and_queries(spark):
    from nextgenetl_spark.operators.similarity import (
        blocked_near_dup_pairs_vectorized,
        cosine_topk,
        cosine_topk_gemm,
    )

    e = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    q = e.select(F.col("vec_id").alias("query_id"), "embedding")
    c = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    assert cosine_topk(q, c).count() == 0
    assert cosine_topk_gemm(q, c).count() == 0
    assert blocked_near_dup_pairs_vectorized(e).count() == 0


def test_single_doc_and_whitespace_only_text(spark):
    rows = [(1, "   "), (2, "one"), (3, "one two")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # fingerprints exist for every doc, including whitespace-only
    assert D.md5_simhash_fingerprints(df).count() == 3
    sigs = D.minhash_signatures(df)
    assert sigs.count() == 3
    # no self-pairs, no crash on single/degenerate shingles
    assert D.minhash_near_dup_pairs(df, threshold=0.9).filter("a_id = b_id").count() == 0


def test_sampling_on_empty_input(spark):
    from nextgenetl_spark.operators.sampling import deterministic_split

    e = _empty_docs(spark)
    out = deterministic_split(e, id_col="doc_id", thresholds=[("cccc", "train"), ("e666", "val")])
    assert out.count() == 0
