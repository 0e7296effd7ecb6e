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


# Queries with a green oracle row in round 1 (CORRECTNESS_r01.json). The
# driver's per-round check walks queries() in registration order and may not
# reach the end of the list, so load_all() registers everything *without*
# prior oracle evidence first and the already-verified (plus slowest, the
# availableNow streaming runs in events.py) last.
_VERIFIED_R01 = frozenset({
    "explode_tokens", "posexplode_offset", "zip_arrays", "leaf_extract",
    "json_props", "tumbling_window", "sessionize", "packed_multivalue",
    "sliding_window", "stream_tumbling_window", "stream_sessionize",
    "stream_user_profile", "stream_sliding_window", "stream_dedup_keys",
    "stream_static_enrich", "stream_interval_join", "stratified_sample",
    "time_grid_fill", "asof_purchase_view", "range_join_post_purchase",
    "stream_lake_publish", "stream_history_antijoin", "gtf_parse",
    "maf_concat", "tsv_infer_load", "vcf_parse", "jsonl_infer_load",
    "orc_roundtrip", "partition_pruning", "schema_evolution",
    "multimodal_decode", "frame_sample", "pipeline_chain", "publish_current",
    "pricing_summary", "manifest_filter", "pull_list_join", "multiway_star",
    "left_join_counts", "child_count_attach", "full_outer_diff",
    "anti_membership", "semi_membership", "self_join_roles", "expr_key_join",
    "coalesced_legs", "union_provenance", "except_distinct",
    "union_distinct", "intersect_distinct",
})


def load_all() -> dict[str, Workload]:
    """Import every workload module (side-effect: registry population)."""
    # Import order = registration order within each partition; text and
    # similarity (the LLM-data-pipeline surface, zero oracle rows in r01)
    # go first so the driver reaches them earliest.
    from nextgenetl_spark.workloads import text  # noqa: F401  isort: skip
    from nextgenetl_spark.workloads import similarity  # noqa: F401  isort: skip
    from nextgenetl_spark.workloads import relational  # noqa: F401  isort: skip
    from nextgenetl_spark.workloads import (  # noqa: F401
        arrays,
        events,
        files,
        multimodal,
        pipelines,
    )

    def _tier(item):
        n, wl = item
        if n not in _VERIFIED_R01:
            return 0  # no oracle evidence yet — check first
        if wl.fn.__module__.endswith(".events"):
            return 2  # verified AND slowest (availableNow streaming) — last
        return 1

    ordered = dict(sorted(REGISTRY.items(), key=_tier))
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
