"""Scalar / array expression helpers — the BigQuery-dialect function surface
the reference's generated SQL relies on (SURVEY.md §2.8-2.9), expressed as
Column-level builders over pyspark.sql.functions so everything stays inside
whole-stage codegen (no Python UDFs).
"""

from nextgenetl_spark.functions.text import (
    caller_flag,
    concat_to_multi,
    delim_count,
    leaf_name,
    normalize_value,
    split_offset,
    string_agg,
    string_agg_distinct,
    zip_split,
)

__all__ = [
    "caller_flag",
    "concat_to_multi",
    "delim_count",
    "leaf_name",
    "normalize_value",
    "split_offset",
    "string_agg",
    "string_agg_distinct",
    "zip_split",
]
