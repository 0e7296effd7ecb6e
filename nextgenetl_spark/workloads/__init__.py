"""Oracle-paired query registry — the driver-contract surface.

Each workload is a (spark, sf_dir) -> DataFrame callable plus (usually) an
equivalent DuckDB SQL string. The driver runs both at sf0.01 and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides,
- float aggregates are rounded on both sides (fp accumulation order differs
  between engines; rounding pins the comparable value),
- DuckDB's HUGEINT sums and DOUBLE epochs are cast to match Spark's types.

Modules self-register via the ``@workload`` decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Workload:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check


REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Workload(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, Workload]:
    """Import every workload module (side-effect: registry population)."""
    from nextgenetl_spark.workloads import (  # noqa: F401
        arrays,
        events,
        files,
        multimodal,
        pipelines,
        relational,
        similarity,
        text,
    )

    return REGISTRY
