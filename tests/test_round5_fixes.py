"""Round-5 hardening regressions for the round-4 ADVICE items: unmapped-type
schema sidecars, dangling stream-stage symlinks, qhist oracle overflow
symmetry, temp-view shadowing of the bucketed-write residual cleanup."""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import types as T


def test_schema_sidecar_survives_unmapped_atomic_types():
    """schema_to_fields maps NTZ/short/byte best-effort and degrades any
    other atomic (binary) to STRING instead of raising KeyError after the
    CSV already wrote (ADVICE: plans/pipeline.py export_csv sidecar)."""
    from nextgenetl_spark.schemas import fields_to_schema, schema_to_fields

    schema = T.StructType(
        [
            T.StructField("ntz", T.TimestampNTZType()),
            T.StructField("s", T.ShortType()),
            T.StructField("b", T.ByteType()),
            T.StructField("raw", T.BinaryType()),
        ]
    )
    fields = schema_to_fields(schema)
    assert [f["type"] for f in fields] == ["DATETIME", "INT64", "INT64", "STRING"]
    # DATETIME reloads as a Spark timestamp via BQ_TO_SPARK — round-trippable
    back = fields_to_schema(fields)
    assert back["ntz"].dataType == T.TimestampType()


def test_stage_symlinks_prunes_dangling_links(tmp_path):
    """After an in-place source regeneration, same-basename stale links must
    re-link (no FileExistsError) and different-basename danglers must be
    pruned from the stage dir (ADVICE: streaming/source.py lexists)."""
    from nextgenetl_spark.streaming.source import _stage_symlinks

    src = tmp_path / "tbl.parquet"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"v1")
    (src / "old-name.parquet").write_bytes(b"v1")
    stage = str(tmp_path / "stage")
    _stage_symlinks(str(src), stage)
    assert sorted(os.listdir(stage)) == ["old-name.parquet", "part-0.parquet"]

    # regenerate in place: part-0 rewritten (same basename), old-name gone,
    # new-name appears — both staged links now dangle
    (src / "part-0.parquet").unlink()
    (src / "old-name.parquet").unlink()
    (src / "part-0.parquet").write_bytes(b"v2")
    (src / "new-name.parquet").write_bytes(b"v2")

    _stage_symlinks(str(src), stage)  # must not raise FileExistsError
    names = sorted(os.listdir(stage))
    assert names == ["new-name.parquet", "part-0.parquet"]
    for n in names:
        assert os.path.exists(os.path.join(stage, n))  # nothing dangles


def test_qhist_oracle_clamps_before_int_cast(spark):
    """The value_quantile_sketch DuckDB oracle must survive a heavy-tail
    value whose floored bin exceeds INT32 (ADVICE: workloads/events.py —
    clamp on BIGINT first, then cast), and still match qhist exactly."""
    from nextgenetl_spark.operators.agg import qhist_build, qhist_quantiles
    from nextgenetl_spark.workloads import load_all

    oracle = load_all()["value_quantile_sketch"].oracle
    vals = [float(v) for v in range(0, 500, 7)] + [-3.0, 6.0e9, None]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = qhist_quantiles(
        qhist_build(df, "value", lo=0.0, hi=500.0, n_bins=256),
        [0.5, 0.9, 0.99],
        lo=0.0,
        hi=500.0,
        n_bins=256,
    )
    spark_rows = sorted((r["q"], r["value"]) for r in got.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES %s) AS t(value)"
        % ", ".join("(CAST(%s AS DOUBLE))" % ("NULL" if v is None else repr(v)) for v in vals)
    )
    # pre-fix this raised a conversion error on the 6e9 row
    duck_rows = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert spark_rows == duck_rows


def test_residual_cleanup_ignores_temp_view_shadow(spark, tmp_path):
    """A temp view shadowing a table name must not suppress the
    crash-residue directory cleanup (ADVICE: plans/bucketing.py
    tableExists matches temp views)."""
    from nextgenetl_spark.plans.bucketing import _clear_residual_location

    name = "shadowed_residual_tbl"
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    loc = os.path.join(warehouse, name)
    os.makedirs(loc, exist_ok=True)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame([(1,)], "k long").createOrReplaceTempView(name)
    try:
        _clear_residual_location(spark, name)
        assert not os.path.isdir(loc), "temp view suppressed residual cleanup"
    finally:
        spark.catalog.dropTempView(name)


def test_swar_vote_fold_matches_naive_and_handles_empty_docs(spark):
    """The SWAR-packed vote fold must produce bit-identical fingerprints to
    a naive per-bit ±1 vote, including the explode_outer null row of an
    NULL-text document (md5(null) propagates null hash halves → coalesced word
    0 → fp 0, matching the old per-bit when-form)."""
    from pyspark.sql import functions as F

    from nextgenetl_spark.operators.dedup import (
        md5_simhash_fingerprints,
        simhash_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, None),
            (4, "completely different text about spark aggregation"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in md5_simhash_fingerprints(docs).collect()}
    assert got[3] == 0  # NULL text: null token array → null md5 halves → fp 0

    # naive reference: per-bit ±1 votes over the same md5 bit layout
    from nextgenetl_spark.operators.textstats import tokens

    base = docs.select("doc_id", F.explode_outer(F.array_distinct(tokens("text"))).alias("t"))
    base = base.select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("n1"),
        F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long").alias("n2"),
    )
    masks = [(1 << b) if b < 63 else -(2**63) for b in range(64)]
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("n1" if b < 32 else "n2"), (31 - b) if b < 32 else (63 - b))
                .bitwiseAND(F.lit(1))
                != 0,
                1,
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    votes = base.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b, m in enumerate(masks):
        fp = fp + F.when(F.col(f"v{b}") > 0, F.lit(m).cast("long")).otherwise(F.lit(0).cast("long"))
    naive = {r["doc_id"]: r["fp"] for r in votes.select("doc_id", fp.alias("fp")).collect()}
    # naive form yields null fp for the empty doc (null votes); SWAR pins it to 0
    assert naive[3] is None or naive[3] == 0
    for d in (1, 2, 4):
        assert got[d] == naive[d], f"doc {d}: SWAR {got[d]:#x} != naive {naive[d]:#x}"

    # xxhash production path: empty doc folds the single null-token hash
    xx = {r["doc_id"]: r["fp"] for r in simhash_fingerprints(docs).collect()}
    assert set(xx) == {1, 2, 3, 4} and all(v is not None for v in xx.values())


def test_staged_phash_fps_match_fresh_compute(spark):
    """The staged pHash fingerprint scans (workloads/multimodal.py
    _staged_phash_fps) must serve bit-identical fp values to a fresh
    in-plan computation for BOTH hash variants — the staging is a cost
    move, never a semantics change."""
    from nextgenetl_spark.operators.multimodal import (
        attach_blob,
        attach_image_blob,
        perceptual_hash,
        perceptual_hash_pixels,
    )
    from nextgenetl_spark.workloads.multimodal import (
        _phash_variant_corpus,
        _staged_phash_fps,
    )

    sf = "/root/testdata/sf0.001"
    for pixels in (False, True):
        corpus = _phash_variant_corpus(spark, sf, pixels)
        if pixels:
            fresh = perceptual_hash_pixels(attach_image_blob(corpus))
        else:
            fresh = perceptual_hash(attach_blob(corpus))
        fresh_rows = {r.doc_id: r.fp for r in fresh.collect()}
        staged_rows = {r.doc_id: r.fp for r in _staged_phash_fps(spark, sf, pixels).collect()}
        assert staged_rows == fresh_rows, f"pixels={pixels}"
