"""Publish / version tail (SURVEY.md §3.4).

Reference behavior: before publishing a new release table, diff it against
the previous release (EXCEPT DISTINCT union, common_etl/support.py:
2072-2123); if identical, skip republish; else copy to ``_versioned``
(release-stamped) and ``_current`` locations and archive-tag the old
version (support.py:2025-2070; cda_bq_etl/bq_helpers/create_modify.py:
210-278; utils.py:368-382 find_most_recent_release at :1876-1918).

Spark mapping: tables are parquet directories under a warehouse root:
``{root}/{table}_versioned/{release}/`` + ``{root}/{table}_current/``.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from nextgenetl_spark.diff import tables_equal


def _versioned_dir(root: str, table: str) -> str:
    return os.path.join(root, f"{table}_versioned")


def find_most_recent_release(root: str, table: str) -> str | None:
    """Latest release under the versioned dir (releases sort by the numeric
    tail of 'rNN'-style names, falling back to lexicographic)."""
    vdir = _versioned_dir(root, table)
    if not os.path.isdir(vdir):
        return None
    releases = [d for d in os.listdir(vdir) if not d.startswith("_") and not d.startswith(".")]
    if not releases:
        return None

    def sort_key(r: str):
        m = re.search(r"(\d+)$", r)
        return (0, int(m.group(1))) if m else (1, r)

    return sorted(releases, key=sort_key)[-1]


def publish_table(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    table: str,
    release: str,
    nan_tolerant: bool = True,
) -> dict:
    """Compare-then-publish. Returns {'published': bool, 'reason': str,
    'previous_release': str | None}."""
    prev = find_most_recent_release(root, table)
    if prev is not None:
        prev_df = spark.read.parquet(os.path.join(_versioned_dir(root, table), prev))
        if sorted(prev_df.columns) == sorted(df.columns) and tables_equal(prev_df, df, nan_tolerant):
            return {"published": False, "reason": "identical to previous release", "previous_release": prev}

    df.write.mode("overwrite").parquet(os.path.join(_versioned_dir(root, table), release))
    df.write.mode("overwrite").parquet(os.path.join(root, f"{table}_current"))
    return {"published": True, "reason": "new or changed data", "previous_release": prev}
