"""Z-order (Morton) interleaving for multi-dimensional clustering.

The reference's physical-layout tool is single-axis ``CLUSTER BY``
(common_etl/support.py:1148-1160 — our pipeline ``cluster_by`` step). When
queries filter on TWO keys (program AND release, chromosome AND position),
a single-axis sort serves one of them and scatters the other. Z-ordering
interleaves the bits of both keys so rows close in either dimension land in
the same files — parquet min/max row-group stats then skip on both
predicates. This is the same idea as Delta Lake's OPTIMIZE ZORDER BY,
expressed as a plain codegen column: sort by ``zorder_value(a, b)`` before
writing.

All bit math is ``pyspark.sql.functions`` expressions (shiftleft/or/and) —
JVM-side, whole-stage-codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of ``col`` so bit i moves to bit 2i
    (one interleave lane of a 2-D Morton code)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.shiftright(col, i).bitwiseAND(F.lit(1).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, 2 * i))
    return out


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative integer columns: bits of ``a`` on
    even positions, ``b`` on odd. ``bits`` per dimension (16 → 32-bit
    z-value). Values are masked to ``bits`` so out-of-range inputs degrade
    to coarse buckets instead of overflowing."""
    mask = F.lit((1 << bits) - 1).cast("long")
    aa = a.cast("long").bitwiseAND(mask)
    bb = b.cast("long").bitwiseAND(mask)
    return _spread_bits(aa, bits).bitwiseOR(F.shiftleft(_spread_bits(bb, bits), 1))


def zorder_write(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Return ``df`` ordered for a z-clustered write: repartitionByRange on
    the z-value (range partitioner keeps z-neighbors in the same output
    file) + sortWithinPartitions. Write the result with any sink; both
    ``col_a`` and ``col_b`` predicates then skip row groups via min/max
    stats.

    ``num_files`` pins the output file count (target ~128 MB-1 GB per
    file); left None, AQE sizes the range shuffle by data volume — fine
    for a lake write, but it will coalesce a small table into one file."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits).alias("__z")
    zdf = df.withColumn("__z", z)
    zdf = (
        zdf.repartitionByRange(num_files, "__z")
        if num_files
        else zdf.repartitionByRange("__z")
    )
    return zdf.sortWithinPartitions("__z").drop("__z")
