"""Property fuzz of the sequence-packing operators.

Random (part, doc, n_tokens) sets — zero-token docs, oversized docs,
duplicate token counts, multiple parts — packed by the engine must equal
an independent Python walk of the same contract:

- ``greedy_bin_pack``: next-fit per part (close the open bin when the
  next doc would overflow; oversized docs occupy a bin alone);
- ``context_window_chunks``: window_id = the fixed-size window the doc's
  first token lands in, under per-part concat in doc order.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

from nextgenetl_spark.operators.packing import context_window_chunks, greedy_bin_pack


@st.composite
def _corpora(draw):
    budget = draw(st.sampled_from([8, 16, 50]))
    rows = []
    doc_id = 0
    for part in ["a", "b", "c"][: draw(st.integers(1, 3))]:
        for _ in range(draw(st.integers(1, 15))):
            doc_id += 1
            rows.append((part, doc_id, draw(st.integers(0, 70))))
    return budget, rows


def _ref_next_fit(rows_in_part, budget):
    out, bin_id, fill = {}, 0, 0
    for _part, doc, t in sorted(rows_in_part, key=lambda r: r[1]):
        if fill > 0 and fill + t > budget:
            bin_id += 1
            fill = 0
        out[doc] = bin_id
        fill += t
    return out


def _ref_windows(rows_in_part, budget):
    out, acc = {}, 0
    for _part, doc, t in sorted(rows_in_part, key=lambda r: r[1]):
        out[doc] = acc // budget
        acc += t
    return out


@settings(
    max_examples=fuzz_examples(60, 25),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_corpora())
def test_packing_matches_reference_walk(spark, case):
    budget, rows = case
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    parts = {p for p, _, _ in rows}

    expected_bins = {}
    expected_wins = {}
    for p in parts:
        in_part = [r for r in rows if r[0] == p]
        expected_bins.update(_ref_next_fit(in_part, budget))
        expected_wins.update(_ref_windows(in_part, budget))

    packed = greedy_bin_pack(df, budget=budget).collect()
    assert len(packed) == len(rows)  # every doc exactly once
    got_bins = {r["doc_id"]: r["bin_id"] for r in packed}
    assert got_bins == expected_bins, f"budget={budget} rows={rows}"
    # the packing invariant itself: a bin only exceeds the budget when a
    # single token-BEARING doc is responsible (zero-token docs occupy no
    # space and may legally share an oversized doc's bin)
    fills = {}
    bearing = {}
    for r in packed:
        key = (r["source"], r["bin_id"])
        fills[key] = fills.get(key, 0) + r["n_tokens"]
        bearing[key] = bearing.get(key, 0) + (1 if r["n_tokens"] > 0 else 0)
    for key, total in fills.items():
        assert total <= budget or bearing[key] == 1, f"overfull shared bin {key}"

    chunked = context_window_chunks(df, budget=budget).collect()
    got_wins = {r["doc_id"]: r["window_id"] for r in chunked}
    assert got_wins == expected_wins, f"budget={budget} rows={rows}"
