"""MAF (Mutation Annotation Format) multi-file concatenation (S4/Y6).

Reference: BQ_Table_Building/build_open_somatic_mut_bq_table.py:235-304 —
many per-sample MAF TSVs are concatenated into one table, with
(a) a ``file_gdc_id`` column synthesized from each source file's name, and
(b) the `;`-packed ``callers`` string expanded into one Yes/No/Yes* column
per known caller (:213-233).

Spark design: one globbed ``spark.read.csv`` (parallel scan, no driver-side
concat), ``input_file_name()`` for provenance, per-caller flag expressions.
The reference's threaded BucketPuller + sequential file append collapses
into the scan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextgenetl_spark.functions.text import caller_flag

DEFAULT_CALLERS = ("muse", "mutect2", "pindel", "varscan2")


def read_maf_concat(
    spark: SparkSession,
    paths: str | list,
    callers: tuple = DEFAULT_CALLERS,
    callers_col: str = "callers",
    file_id_col: str = "file_gdc_id",
    sep: str = "\t",
    comment: str = "#",
) -> DataFrame:
    """Read MAF file(s) → one DataFrame with file-provenance and caller
    flags. MAF headers start with '#version' comment lines; the first
    non-comment row is the header."""
    df = (
        spark.read.options(sep=sep, header=True, comment=comment)
        .csv(paths)
        .withColumn(
            file_id_col,
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\.maf)?(\.tsv)?(\.gz)?$", 1),
        )
    )
    if callers_col in df.columns:
        for caller in callers:
            df = df.withColumn(caller, caller_flag(callers_col, caller))
    return df
