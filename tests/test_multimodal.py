"""Multimodal binary-column plumbing tests: blob attach, Arrow-batched
decode stub, frame sampling, blocked embedding near-dup, codec stub gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nextgenetl_spark.catalog import load
from nextgenetl_spark.operators import multimodal as M
from nextgenetl_spark.operators.similarity import blocked_near_dup_pairs
from tests.conftest import SF_SMOKE


def test_attach_blob_binary_type(spark):
    blobs = M.attach_blob(load(spark, SF_SMOKE, "documents"))
    assert isinstance(blobs.schema["blob"].dataType, T.BinaryType)


def test_decode_features_match_bytes(spark):
    df = spark.createDataFrame([(7, "hello world"), (8, "")], ["doc_id", "text"])
    feats = {r["doc_id"]: r for r in M.decode_media_features(M.attach_blob(df)).collect()}
    assert feats[7]["blob_len"] == 11
    assert feats[7]["header_hex"] == b"hell".hex()
    assert feats[7]["fake_width"] == 11 % 64 + 1
    assert feats[7]["n_channels"] == 3
    assert feats[8]["blob_len"] == 0
    assert feats[8]["header_hex"] == ""


def test_decode_schema_is_declared(spark):
    blobs = M.attach_blob(load(spark, SF_SMOKE, "documents"))
    assert M.decode_media_features(blobs).schema == M.MEDIA_FEATURE_SCHEMA


def test_sample_frames_expands_rows(spark):
    df = spark.createDataFrame([(1, "x" * 1050)], ["doc_id", "text"])
    out = M.sample_frames(M.attach_blob(df), every_n=5, bytes_per_frame=100).collect()
    # 10 frames, every 5th → indices 0 and 5
    assert sorted(r["frame_idx"] for r in out) == [0, 5]
    assert all(r["n_frames"] == 10 for r in out)


def test_decode_image_is_gated(spark):
    blobs = M.attach_blob(load(spark, SF_SMOKE, "documents"))
    with pytest.raises(NotImplementedError):
        M.decode_image(blobs)


def test_blocked_near_dup_stays_in_block(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [1.0, 0.0], 1),  # identical to vec 1 but different block → never paired
        (4, [-1.0, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    pairs = {(r["a_id"], r["b_id"]): r["sim"] for r in blocked_near_dup_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert all(a != 3 and b != 3 for a, b in pairs)
    assert (1, 4) not in pairs


def test_vectorized_near_dup_matches_expression_form(spark):
    from nextgenetl_spark.operators.similarity import blocked_near_dup_pairs_vectorized

    emb = load(spark, SF_SMOKE, "embeddings")
    expr = {(r["a_id"], r["b_id"]): r["sim"] for r in blocked_near_dup_pairs(emb, threshold=0.25).collect()}
    vec = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in blocked_near_dup_pairs_vectorized(emb, threshold=0.25).collect()
    }
    assert expr == vec and expr


def test_extract_features_deterministic_and_bounded(spark):
    from nextgenetl_spark.catalog import load
    from nextgenetl_spark.operators.multimodal import attach_blob, extract_features
    from tests.conftest import SF_SMOKE

    blobs = attach_blob(load(spark, SF_SMOKE, "documents").limit(50))
    a = sorted(map(tuple, extract_features(blobs).collect()))
    b = sorted(map(tuple, extract_features(blobs).collect()))
    assert a == b
    for row in a:
        for f in row[1:]:
            assert 0.0 <= f < 1.0


def test_resize_image_raises_without_codec(spark):
    import pytest

    from nextgenetl_spark.catalog import load
    from nextgenetl_spark.operators.multimodal import attach_blob, resize_image
    from tests.conftest import SF_SMOKE

    blobs = attach_blob(load(spark, SF_SMOKE, "documents").limit(1))
    with pytest.raises(NotImplementedError, match="resize requires PIL"):
        resize_image(blobs, 32, 32)


def test_phash_finds_planted_reencodes(spark):
    from pyspark.sql import functions as F

    from nextgenetl_spark.operators.dedup import banded_hamming_pairs
    from nextgenetl_spark.operators.multimodal import attach_blob, perceptual_hash
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    variants = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("za")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(variants)
    pairs = banded_hamming_pairs(
        perceptual_hash(attach_blob(corpus)), max_hamming=3, num_bands=4
    )
    got = {(r["a_id"], r["b_id"]): r["hamming"] for r in pairs.collect()}
    for i in range(10):
        # appending 'za' flips exactly the z- and a-count parity bits
        assert got[(i, i + 1000000)] == 2


def test_perceptual_hash_is_permutation_invariant(spark):
    """Histogram bits must not move when bytes reorder (the property a
    position-striped hash lacks)."""
    from nextgenetl_spark.operators.multimodal import attach_blob, perceptual_hash

    df = spark.createDataFrame([(1, "abcza"), (2, "zacba")], ["doc_id", "text"])
    fps = {r["doc_id"]: r["fp"] for r in perceptual_hash(attach_blob(df)).collect()}
    assert fps[1] == fps[2]
