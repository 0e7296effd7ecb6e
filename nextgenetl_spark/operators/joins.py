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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tiebreaker: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """As-of join: attach to every left row the LATEST right row with
    ``right_ts <= left_ts`` for the same key (LEFT semantics: unmatched
    left rows keep NULLs). Spark has no native ASOF JOIN; the naive rewrite
    (range-predicate join + row_number) is a per-key cross product. This is
    the scale-correct composition: tag both inputs, UNION them, and run a
    single ``last(ignorenulls)`` window per key —

        cost = ONE shuffle of |left|+|right| rows on the key and one sort,
        independent of how many right rows precede each left row.

    Ties: a right row at exactly ``left_ts`` matches (inclusive); among
    right rows sharing one timestamp the greatest ``tiebreaker`` wins
    (pass one for determinism — e.g. a unique id).

    ``right_cols`` (default: all non-key, non-ts columns) are attached as
    ``{prefix}{col}``, plus ``{prefix}ts`` = the matched right timestamp.
    """
    from pyspark.sql import Window

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    pay_fields = [F.col(right_ts).alias("__rts")] + [F.col(c) for c in right_cols]
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.struct(*pay_fields).alias("__rpay"),
        F.lit(0).alias("__side"),
    )
    rpay_type = r_tagged.schema["__rpay"].dataType
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(rpay_type).alias("__rpay"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
    )
    r_full = r_tagged.withColumn("__lpay", F.lit(None).cast(l_tagged.schema["__lpay"].dataType))
    order = [F.col("__t").asc(), F.col("__side").asc()]
    if tiebreaker is not None:
        # among right rows at one timestamp the greatest tiebreaker sorts
        # last, so last() picks it; left rows (null __rpay) are unaffected
        order.append(F.col(f"__rpay.{tiebreaker}").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_full)
        .withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__lpay.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{prefix}ts"))
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)
