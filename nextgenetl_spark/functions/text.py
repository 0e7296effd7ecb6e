"""String / multi-value / array expression builders.

The reference models multi-valued attributes as `;`-packed strings and
decodes them in SQL (`SPLIT`, `STRING_AGG`, delimiter-count idiom,
`REGEXP_EXTRACT` ladders). Each helper below is the Spark-native equivalent,
kept as pure Column expressions so they compile into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Null-marker vocabulary the reference normalizes to NULL
# (reference: cda_bq_etl/data_helpers.py:447-486 normalize_value).
NULL_VOCAB = [
    "na",
    "n/a",
    "none",
    "",
    "--",
    "-",
    "null",
    "not reported",
    "unknown",
    "[not available]",
    "[not applicable]",
    "[unknown]",
    ".",
]


def string_agg(col, sep: str = ";", *, sort: bool = True) -> Column:
    """BigQuery ``STRING_AGG(col, sep [ORDER BY col])``.

    Reference sites: plain STRING_AGG
    (CDA/GDC/create_tables_file_metadata_gdc.py:190-194) and the
    ORDER-BY-inside-aggregate variant (:146,154,166). Unordered STRING_AGG is
    nondeterministic, so the default here sorts — matching how the reference's
    own diff suite compares these columns order-insensitively
    (CDA/tests/shared_test_functions.py:196-260).
    """
    collected = F.collect_list(col)
    if sort:
        collected = F.array_sort(collected)
    return F.array_join(collected, sep)


def string_agg_distinct(col, sep: str = ";", *, sort: bool = True) -> Column:
    """``STRING_AGG(DISTINCT col, sep)``
    (reference: BQ_Table_Building/build_open_somatic_mut_bq_table.py:486-487).
    collect_set gives map-side partial aggregation, so the shuffle carries the
    deduplicated set, not every row."""
    collected = F.collect_set(col)
    if sort:
        collected = F.array_sort(collected)
    return F.array_join(collected, sep)


def delim_count(col, delim: str = ";") -> Column:
    """Number of delimiters in a packed multi-value string — the reference's
    ``LENGTH(TRIM(x)) - LENGTH(TRIM(REPLACE(x, ';', '')))`` idiom
    (GDC-Metadata-Processing/build_release_metadata_bq_tables_v2.py:84-90)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.trim(c)) - F.length(F.trim(F.regexp_replace(c, delim, "")))).cast("int")


def concat_to_multi(col, sep: str = ";", max_count: int = 8, *, distinct: bool = True) -> Column:
    """Join ≤N values with ``sep``; collapse to literal ``'multi'`` beyond the
    cap (reference: CDA/GDC/create_tables_file_metadata_gdc.py:44-75,
    MAX_CONCAT_COUNT=8; also mergeStrings,
    GDC-Metadata-Processing/scripts/queryByCase.py:1042-1060).

    Aggregate version: apply over collect_set/collect_list of a group.
    """
    arr = F.array_sort(F.collect_set(col) if distinct else F.collect_list(col))
    return F.when(F.size(arr) > max_count, F.lit("multi")).otherwise(F.array_join(arr, sep))


def caller_flag(packed, caller: str, sep: str = ";") -> Column:
    """Expand a `;`-packed caller list into one Yes/No(/Yes*) column per
    caller (reference: build_open_somatic_mut_bq_table.py:213-233 — e.g.
    ``callers='muse;mutect2*'`` → muse='Yes', mutect2='Yes*', pindel='No')."""
    c = F.col(packed) if isinstance(packed, str) else packed
    parts = F.split(c, sep)
    return (
        F.when(F.array_contains(parts, caller + "*"), F.lit("Yes*"))
        .when(F.array_contains(parts, caller), F.lit("Yes"))
        .otherwise(F.lit("No"))
    )


def split_offset(col, delim: str, idx: int) -> Column:
    """``SPLIT(x, d)[OFFSET(n)]``
    (reference: CDA/PDC/create_tables_quant_data_matrix_pdc.py:652-653)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, delim).getItem(idx)


def leaf_name(col, delim: str = "\\.") -> Column:
    """``ARRAY_REVERSE(SPLIT(path,'.'))[OFFSET(0)]`` — leaf of a dotted path
    (reference: compare_clinical_gdc_api_releases.py:124)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, delim), -1)


def zip_split(a, b, delim: str = ":") -> Column:
    """Zip two parallel delimiter-packed strings into array<struct> — the
    ``UNNEST(a) WITH OFFSET LEFT JOIN UNNEST(b) WITH OFFSET USING(OFFSET)``
    idiom (reference: build_regulome_explorer_sql_import_v2.py:498-533)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.arrays_zip(F.split(ca, delim), F.split(cb, delim))


def normalize_value(col) -> Column:
    """Column-expression port of the reference's value normalizer
    (cda_bq_etl/data_helpers.py:447-486): null-marker vocabulary → NULL,
    yes/no/true/false → boolean strings, trimmed. Type coercion (trivial
    floats → int) lives in inference.py — this is the string-level pass
    applied during ingest."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    low = F.lower(t)
    return (
        F.when(low.isin(NULL_VOCAB), F.lit(None))
        .when(low.isin(["yes", "true"]), F.lit("True"))
        .when(low.isin(["no", "false"]), F.lit("False"))
        .otherwise(t)
    )
