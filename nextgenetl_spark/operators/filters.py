"""Predicate compilation (SURVEY.md §2.2).

The reference compiles Python dicts into SQL WHERE clauses:
``{k: v}`` → ``k = 'v'``, ``{k: [v1, v2]}`` → ``(k = 'v1' OR k = 'v2')``,
AND-joined across keys (reference: common_etl/support.py:399-431
manifest_builder_sql). Here the same dict compiles to a Column predicate, so
Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def compile_filter(conditions: dict[str, Any]) -> Column:
    """AND of per-key predicates; list values become IN-groups."""
    preds = []
    for key, value in conditions.items():
        if isinstance(value, (list, tuple, set)):
            preds.append(F.col(key).isin(list(value)))
        elif value is None:
            preds.append(F.col(key).isNull())
        else:
            preds.append(F.col(key) == F.lit(value))
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)
