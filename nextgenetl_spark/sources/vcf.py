"""VCF (variant call format) parser (S6).

Reference: BQ_Table_Building/build_cabq_vcf.py:336-569 — pandas code that
(a) reads ``##INFO=<ID=...>`` / ``##FORMAT=<ID=...>`` header metadata,
(b) splits the per-sample columns by the FORMAT key list (``GT:AD:DP`` →
one column per key per sample).

Spark design: header metadata is a bounded driver-side read of the file
head (VCF headers are small); the body is a distributed text scan with one
split/getItem projection per column — the per-sample FORMAT explosion is a
generated projection, not a Python loop over rows.
"""

from __future__ import annotations

import gzip
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_RE = re.compile(r"##(INFO|FORMAT)=<ID=([^,>]+)")

FIXED_COLS = ("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")


def read_vcf_header(path: str) -> dict:
    """Driver-side bounded scan of the ## header block: returns
    {'INFO': [ids...], 'FORMAT': [ids...], 'samples': [names...]}."""
    opener = gzip.open if path.endswith(".gz") else open
    meta: dict = {"INFO": [], "FORMAT": [], "samples": []}
    with opener(path, "rt", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            if line.startswith("##"):
                m = _META_RE.match(line)
                if m:
                    meta[m.group(1)].append(m.group(2))
            elif line.startswith("#CHROM"):
                cols = line.rstrip("\n").split("\t")
                meta["samples"] = cols[9:] if len(cols) > 9 else []
                break
            else:
                break
    return meta


def read_vcf(
    spark: SparkSession,
    path: str,
    format_keys: list | None = None,
    info_keys: list | None = None,
) -> DataFrame:
    """VCF → long DataFrame: fixed columns + requested INFO keys as columns
    + one row per sample with FORMAT keys split into columns."""
    meta = read_vcf_header(path)
    format_keys = list(format_keys if format_keys is not None else meta["FORMAT"])
    info_keys = list(info_keys if info_keys is not None else meta["INFO"])
    samples = meta["samples"]

    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    parts = F.split(F.col("value"), "\t")
    cols = [
        parts.getItem(0).alias("CHROM"),
        parts.getItem(1).cast("long").alias("POS"),
        F.nullif(parts.getItem(2), F.lit(".")).alias("ID"),
        parts.getItem(3).alias("REF"),
        parts.getItem(4).alias("ALT"),
        F.when(parts.getItem(5) == ".", None).otherwise(parts.getItem(5).cast("double")).alias("QUAL"),
        parts.getItem(6).alias("FILTER"),
        parts.getItem(7).alias("INFO"),
        parts.getItem(8).alias("FORMAT"),
    ]
    for i, sample in enumerate(samples):
        cols.append(parts.getItem(9 + i).alias(f"__sample_{i}"))
    df = lines.select(*cols)

    for key in info_keys:
        # INFO entries are `;`-packed `K=V` pairs (flags are bare `K`)
        df = df.withColumn(
            f"info_{key}",
            F.nullif(F.regexp_extract(F.col("INFO"), rf"(?:^|;){re.escape(key)}=([^;]*)", 1), F.lit("")),
        )

    if not samples:
        return df.drop(*[c for c in ("FORMAT",) if c in df.columns])

    # melt samples to long form: (variant..., sample_name, FORMAT values)
    sample_structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sample_name"),
                F.col(f"__sample_{i}").alias("__fmt_values"),
            )
            for i, s in enumerate(samples)
        ]
    )
    df = (
        df.withColumn("__s", F.explode(sample_structs))
        .select("*", F.col("__s.sample_name").alias("sample_name"), F.col("__s.__fmt_values").alias("__fmt_values"))
        .drop("__s", *[f"__sample_{i}" for i in range(len(samples))])
    )
    # FORMAT declares the key order per row (e.g. GT:AD:DP); find each
    # requested key's position in that row's FORMAT and take that slot.
    fmt_arr = F.split(F.col("FORMAT"), ":")
    val_arr = F.split(F.col("__fmt_values"), ":")
    for key in format_keys:
        idx = F.array_position(fmt_arr, key)  # 1-based; 0 = absent
        df = df.withColumn(
            key, F.when(idx > 0, F.element_at(val_arr, idx.cast("int"))).otherwise(F.lit(None))
        )
    return df.drop("FORMAT", "__fmt_values")
