"""Approximate string matching / record linkage (extension surface).

Fuzzy joins are the dirty-dimension canonicalization step every warehouse
eventually needs (the reference's GDC pipelines normalize case/aliases by
hand in SQL — e.g. program-name harmonization across releases; this is the
systematic version). Semantics: block candidate names so the quadratic
edit-distance comparison only runs within bounded blocks, exactly like the
text/embedding near-dup operators — same ``bounded_block_guard`` contract,
same 100-TB story (the name dimension is orders of magnitude smaller than
the fact table, and blocking bounds the pair space).

`levenshtein` is a JVM built-in (codegen'd), so the comparison itself never
leaves the executor or drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nextgenetl_spark.operators.dedup import _with_guard, bounded_block_guard


def fuzzy_pairs(
    names: DataFrame,
    name_col: str,
    block: Column,
    max_dist: int,
    max_block_rows: int = 5000,
) -> DataFrame:
    """All within-block name pairs with 1 <= levenshtein <= max_dist.

    ``names`` should be the DISTINCT name dimension (dedupe upstream — the
    fact table's duplication factor must not enter the pair space). Output:
    (name_a, name_b, dist) with name_a < name_b lexicographically.
    """
    b = names.select(F.col(name_col).alias("name"), block.alias("blk")).distinct()
    guard = bounded_block_guard(
        b, "blk", max_block_rows, "fuzzy_pairs",
        "Tighten the blocking expression (e.g. add a length band or more prefix chars).",
    )
    a = b.alias("a")
    c = b.alias("c")
    pairs = (
        a.join(c, (F.col("a.blk") == F.col("c.blk")) & (F.col("a.name") < F.col("c.name")))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("c.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("c.name")).alias("dist"),
        )
        .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
    )
    return _with_guard(pairs, guard)


def best_fuzzy_match(
    names: DataFrame,
    name_col: str,
    block: Column,
    max_dist: int,
    max_block_rows: int = 5000,
) -> DataFrame:
    """For every distinct name, its single nearest OTHER name within the
    block (min edit distance, ties broken lexicographically) — the
    candidate-generation step of a merge/canonicalize pass. Names with no
    in-block neighbor within max_dist are omitted (no match to act on).

    Pairs are generated once in canonical (a < b) order and mirrored with a
    union rather than joining the dimension to itself twice — half the
    levenshtein evaluations, and the window then picks per-name minima."""
    pairs = fuzzy_pairs(names, name_col, block, max_dist, max_block_rows)
    both = pairs.select(
        F.col("name_a").alias("name"), F.col("name_b").alias("match"), "dist"
    ).unionByName(
        pairs.select(
            F.col("name_b").alias("name"), F.col("name_a").alias("match"), "dist"
        )
    )
    w = Window.partitionBy("name").orderBy("dist", "match")
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", "match", "dist")
    )
