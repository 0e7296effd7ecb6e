"""GTF (gene transfer format) parser (S5).

Reference: BQ_Table_Building/build_gtf_bq_table.py:131-215 — a pandas loop
that splits the 9 tab-separated GTF columns and explodes the `;`-packed
``attribute`` column (``gene_id "ENSG..."; gene_name "TP53"; ...``) into
one column per attribute key.

Spark design: ``spark.read.text`` (handles .gz transparently) → one select
with split/regexp_extract per attribute — a single scan-stage projection,
no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GTF_COLS = ("seqname", "source", "feature", "start", "end", "score", "strand", "frame")

DEFAULT_ATTRS = ("gene_id", "gene_name", "gene_type", "transcript_id", "transcript_name", "exon_number")


def read_gtf(
    spark: SparkSession,
    path: str,
    attributes: tuple = DEFAULT_ATTRS,
) -> DataFrame:
    """GTF → typed DataFrame with attribute columns extracted."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    parts = F.split(F.col("value"), "\t")
    df = lines.select(
        parts.getItem(0).alias("seqname"),
        parts.getItem(1).alias("source"),
        parts.getItem(2).alias("feature"),
        parts.getItem(3).cast("long").alias("start"),
        parts.getItem(4).cast("long").alias("end"),
        F.when(parts.getItem(5) == ".", None).otherwise(parts.getItem(5).cast("double")).alias("score"),
        parts.getItem(6).alias("strand"),
        F.when(parts.getItem(7) == ".", None).otherwise(parts.getItem(7).cast("int")).alias("frame"),
        parts.getItem(8).alias("attribute"),
    )
    for attr in attributes:
        # attribute format: key "value"; — empty string when the key is absent
        df = df.withColumn(
            attr,
            F.nullif(F.regexp_extract(F.col("attribute"), rf'{attr} "([^"]*)"', 1), F.lit("")),
        )
    return df.drop("attribute")
