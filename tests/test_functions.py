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
