"""Deterministic sampling / splitting for training-data pipelines.

A training corpus needs stable, reproducible train/val/test membership: the
same document must land in the same split on every run, on every engine, and
after any repartition. Random sampling (``df.sample``) is none of those.
The standard trick is hash-threshold splitting: bucket = a fixed-width
prefix of md5(id), compared against hex thresholds. md5 is identical
everywhere (Spark, DuckDB, Python), the comparison is a plain string
compare, and membership depends only on the id — so splits are stable under
re-runs, engine swaps, and incremental corpus growth (new docs never move
old docs between splits).

Scan-stage expressions only — no shuffle, no UDF, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col, width: int = 4) -> F.Column:
    """Lowercase-hex md5 prefix of the (stringified) id — a uniform
    deterministic bucket key in [0x0…0, 0xf…f]."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, width)


def deterministic_split(
    df: DataFrame, id_col: str, thresholds: list[tuple[str, str]], default: str = "test"
) -> DataFrame:
    """Assign a split label per row from ordered (hex_threshold, label)
    pairs: the first threshold the bucket sorts below wins, else ``default``.
    E.g. ``[("cccc", "train"), ("e666", "val")]`` ≈ 80/10/10."""
    b = hash_bucket(id_col)
    expr = None
    for bound, label in thresholds:
        cond = b < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr.otherwise(default))
