"""Unit tests for the expression helpers (functions/text.py) and core
operator compositions on tiny in-memory DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from nextgenetl_spark.functions import (
    caller_flag,
    concat_to_multi,
    delim_count,
    leaf_name,
    normalize_value,
    split_offset,
    string_agg,
    string_agg_distinct,
)
from nextgenetl_spark.operators.agg import analytic_max, any_value_dedup, child_counts, nonnull_profile
from nextgenetl_spark.operators.filters import compile_filter
from nextgenetl_spark.operators.setops import except_distinct, symmetric_diff, union_by_name_padded


def test_string_agg_variants(spark):
    df = spark.createDataFrame(
        [("g1", "b"), ("g1", "a"), ("g1", "b"), ("g2", "z")], ["g", "v"]
    )
    out = {
        r["g"]: (r["all"], r["dist"])
        for r in df.groupBy("g")
        .agg(string_agg(F.col("v")).alias("all"), string_agg_distinct(F.col("v")).alias("dist"))
        .collect()
    }
    assert out["g1"] == ("a;b;b", "a;b")
    assert out["g2"] == ("z", "z")


def test_delim_count_and_concat_to_multi(spark):
    df = spark.createDataFrame([("a;b;c",), ("solo",)], ["v"])
    rows = df.select(delim_count("v").alias("d")).collect()
    assert [r["d"] for r in rows] == [2, 0]

    vals = spark.createDataFrame([("g", str(i)) for i in range(10)] + [("h", "x")], ["g", "v"])
    out = {r["g"]: r["m"] for r in vals.groupBy("g").agg(concat_to_multi(F.col("v"), max_count=8).alias("m")).collect()}
    assert out["g"] == "multi"
    assert out["h"] == "x"


def test_caller_flag(spark):
    df = spark.createDataFrame([("muse;mutect2*",), ("pindel",)], ["callers"])
    rows = df.select(
        caller_flag("callers", "muse").alias("muse"),
        caller_flag("callers", "mutect2").alias("mutect2"),
        caller_flag("callers", "pindel").alias("pindel"),
    ).collect()
    assert tuple(rows[0]) == ("Yes", "Yes*", "No")
    assert tuple(rows[1]) == ("No", "No", "Yes")


def test_split_leaf_normalize(spark):
    df = spark.createDataFrame([("a.b.c", " Not Reported ", "x:y")], ["p", "n", "s"])
    r = df.select(
        leaf_name("p").alias("leaf"),
        normalize_value("n").alias("norm"),
        split_offset("s", ":", 0).alias("head"),
    ).collect()[0]
    assert (r["leaf"], r["norm"], r["head"]) == ("c", None, "x")


def test_compile_filter(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["k", "v"])
    assert df.filter(compile_filter({"v": ["a"], "k": 3})).count() == 1
    assert df.filter(compile_filter({})).count() == 3


def test_setops_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    # EXCEPT DISTINCT: dedups both sides first
    assert [r["k"] for r in except_distinct(a, b).collect()] == [1]
    sd = symmetric_diff(a.select("k"), b.select("k"))
    got = {(r["k"], r["diff_side"]) for r in sd.collect()}
    assert got == {(1, "old"), (3, "new")}


def test_union_by_name_padded(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([(2,)], ["k"])
    out = union_by_name_padded([a, b], provenance=["ta", "tb"])
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "x", "ta"), (2, None, "tb")}


def test_child_counts_and_profile(spark):
    parent = spark.createDataFrame([(1,), (2,)], ["id"])
    child = spark.createDataFrame([(1,), (1,)], ["id"])
    out = {r["id"]: r["n"] for r in child_counts(parent, child, "id", "n").collect()}
    assert out == {1: 2, 2: 0}

    df = spark.createDataFrame([(1, None), (2, "x")], ["a", "b"])
    prof = nonnull_profile(df).collect()[0]
    assert (prof["a_count"], prof["b_count"]) == (2, 1)


def test_any_value_dedup_and_analytic_max(spark):
    df = spark.createDataFrame([(1, "a", 5), (1, "b", 9), (2, "c", 1)], ["k", "v", "x"])
    assert any_value_dedup(df, ["k"]).count() == 2
    out = analytic_max(df, ["k"], "x", "mx")
    assert {(r["k"], r["mx"]) for r in out.collect()} == {(1, 9), (2, 1)}


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_value_matches_reference_bit_interleave(spark):
    from pyspark.sql import functions as F

    from nextgenetl_spark.functions.zorder import zorder_value

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 1), (65535, 65535), (70000, 2)]
    df = spark.createDataFrame(pairs, "a long, b long").withColumn(
        "z", zorder_value(F.col("a"), F.col("b"))
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for a, b in pairs:
        assert got[(a, b)] == _morton_ref(a & 0xFFFF, b & 0xFFFF), (a, b)


def test_zorder_write_clusters_both_dimensions(spark):
    """Rows in the same z-ordered file span a bounded rectangle: min/max
    stats on BOTH columns stay tight, unlike a single-axis sort where the
    second column spans its full range in every file."""
    import itertools

    from pyspark.sql import functions as F

    from nextgenetl_spark.functions.zorder import zorder_write

    rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long")
    parts = (
        zorder_write(df, "x", "y", bits=6, num_files=32)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 1)
        .collect()
    )
    assert parts
    # Partitions straddling a quadrant boundary legitimately span wide in
    # both dimensions (Morton ranges jump at high-bit transitions), so the
    # guarantee is statistical: typical file rectangles are bounded in BOTH
    # dimensions, where a single-axis x-sort gives yspan == 63 in EVERY
    # file. Require tight mean spans and a large majority of tight files.
    xm = sum(p["xspan"] for p in parts) / len(parts)
    ym = sum(p["yspan"] for p in parts) / len(parts)
    assert xm < 40 and ym < 40, (xm, ym)
    tight = sum(1 for p in parts if p["xspan"] < 32 and p["yspan"] < 32)
    assert tight >= 0.7 * len(parts), (tight, len(parts))


def test_zorder_value_property(spark):
    """Random pairs agree with the Python bit-interleave reference, and
    z-order preserves quadrant ordering (high bits dominate)."""
    import random

    from pyspark.sql import functions as F

    from nextgenetl_spark.functions.zorder import zorder_value

    rng = random.Random(7)
    pairs = [(rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "a long, b long").withColumn(
        "z", zorder_value(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["a"], r["b"]), (r["a"], r["b"])


def test_asof_join_semantics(spark):
    """Inclusive bound, latest-prior match, tie by greatest tiebreaker,
    NULLs for left rows with no prior right row, key isolation."""
    from nextgenetl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l-a"), (1, 4, "l-b"), (2, 7, "l-c"), (3, 9, "l-d")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 10, 102), (1, 12, 103), (2, 7, 200)],
        "k long, ts long, rid long",
    )
    out = {
        (r["k"], r["ts"]): (r["r_ts"], r["r_rid"])
        for r in asof_join(left, right, "k", tiebreaker="rid").collect()
    }
    assert out[(1, 10)] == (10, 102)   # inclusive; tie -> greatest rid
    assert out[(1, 4)] == (None, None) # no right row at ts<=4... rid 100 is ts5
    assert out[(2, 7)] == (7, 200)     # exact match on other key
    assert out[(3, 9)] == (None, None) # key with no right rows


def test_nfc_normalize_planted_nfd(spark):
    """NFD composed forms normalize to NFC and flag as changed; ASCII and
    already-NFC rows pass through unchanged."""
    import unicodedata

    from nextgenetl_spark.operators.textstats import nfc_normalize

    nfd = unicodedata.normalize("NFD", "école café")
    rows = [(1, "plain ascii"), (2, nfd), (3, "école café"), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["text_nfc"], r["changed"]) for r in nfc_normalize(df).collect()}
    assert out[1] == ("plain ascii", False)
    assert out[2] == ("école café", True)
    assert out[3] == ("école café", False)
    assert out[4][0] is None
    # after normalization, 2 and 3 hash identically (the dedup motivation)
    assert out[2][0] == out[3][0]


def test_sentence_segmentation_ordinals_and_counts(spark):
    from pyspark.sql import functions as F

    from nextgenetl_spark.workloads import load_all

    d = spark.createDataFrame(
        [(1, "First one. Second two words? Third!"), (2, "no punctuation here")],
        ["doc_id", "text"],
    )
    d.createOrReplaceTempView("___tmp")
    sents = F.regexp_extract_all(F.col("text"), F.lit(r"[^.!?]+[.!?]?"), F.lit(0))
    out = (
        d.select("doc_id", F.posexplode(sents).alias("sent_idx", "sentence"))
        .select("doc_id", "sent_idx", F.trim("sentence").alias("s"))
        .filter(F.col("s") != "")
        .collect()
    )
    got = {(r["doc_id"], r["sent_idx"]): r["s"] for r in out}
    assert got == {
        (1, 0): "First one.",
        (1, 1): "Second two words?",
        (1, 2): "Third!",
        (2, 0): "no punctuation here",
    }
