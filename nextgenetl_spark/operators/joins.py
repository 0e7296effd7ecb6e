"""Join helpers (SURVEY.md §2.3).

All reference joins are equi-joins; BigQuery picks the physical strategy.
Here we lean on Catalyst + AQE: dimension tables under the broadcast
threshold broadcast automatically, big facts shuffle on their keys, and AQE
converts to broadcast at runtime when a filtered side turns out small.
``hint_broadcast=True`` forces it for sides we *know* are small at any SF
(region/nation-scale dims) so the plan is stable without relying on stats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """``IN (subquery)`` / ``EXISTS`` membership (reference:
    CDA/GDC/create_tables_file_metadata_gdc.py:137-140;
    CDA/PDC/create_tables_quant_data_matrix_pdc.py:147-156)."""
    return df.join(keys_df, on, "left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """``NOT IN (subquery)`` / ``NOT EXISTS`` (reference:
    gdc_clinical_resources/test_data_integrity.py:79-85). BQ NOT IN with
    NULLs yields no rows; the reference always guards nulls first, so the
    anti-join (null-safe) is the intended semantics."""
    return df.join(keys_df, on, "left_anti")


def self_join_roles(df: DataFrame, role_a: str, role_b: str, on_expr) -> DataFrame:
    """One table joined to itself under two roles — tumor/normal aliquot,
    file/index-file (reference: build_open_somatic_mut_bq_table.py:100-133;
    CDA/GDC/create_tables_per_sample_file_gdc.py:267-303).

    ``on_expr`` is a callable (left_alias, right_alias) -> Column.
    """
    a = df.alias(role_a)
    b = df.alias(role_b)
    return a.join(b, on_expr(role_a, role_b))


def coalesced_left_legs(base: DataFrame, legs: Sequence[tuple[DataFrame, Sequence[str] | str]], value_col: str, out_col: str) -> DataFrame:
    """Two (or more) LEFT JOIN legs whose value columns are COALESCEd —
    the ``USING(col)`` + COALESCE idiom
    (reference: CDA/ICDC/create_tables_visit_icdc.py:33-52)."""
    out = base
    leg_cols = []
    for i, (leg, on) in enumerate(legs):
        alias = f"__leg{i}_{value_col}"
        out = out.join(leg.withColumnRenamed(value_col, alias), on, "left")
        leg_cols.append(alias)
    out = out.withColumn(out_col, F.coalesce(*[F.col(c) for c in leg_cols]))
    return out.drop(*leg_cols)


def star_join(fact: DataFrame, dims: Sequence[tuple[DataFrame, Sequence[str] | str, str]], broadcast_dims: bool = True) -> DataFrame:
    """LEFT-join a fact to N dimensions (reference: the 5-way star in
    CDA/GDC/create_tables_file_metadata_gdc.py:126-140). Dimensions are
    broadcast by default: at 100 TB the fact never shuffles for a dim lookup."""
    out = fact
    for dim, on, how in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on, how)
    return out


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi-join: salt the big side's key with a random shard id
    and replicate the small side across all shards, so one hot key spreads
    over ``num_salts`` tasks instead of stalling a single reducer.

    AQE's skew-join split (enabled in session.py) handles moderate skew at
    runtime; explicit salting is for the pathological case — one key holding
    a double-digit percentage of the table — where even a split partition is
    a straggler. Replication cost: small side × num_salts rows, so keep the
    replicated side dimension-sized.
    """
    salt = (F.rand(seed=42) * num_salts).cast("int")
    big_salted = big.withColumn("__salt", salt)
    small_rep = skewed_small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")
