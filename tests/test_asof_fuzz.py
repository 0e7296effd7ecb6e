"""Property fuzz of the as-of join.

Random left/right event sets over a deliberately tiny (key, ts) domain —
so timestamp collisions, same-instant left/right rows, multiple right
rows per instant, and keys with no right history all occur constantly —
must match a naive Python walk of the contract: each left row gets the
LATEST right row with rts <= lts for its key (inclusive), greatest
tiebreaker winning among equal timestamps, NULLs when no history exists.
The operator computes this with one union + one last(ignorenulls) window
(no per-key cross product); the fuzz pins that composition to the spec.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

from nextgenetl_spark.operators.joins import asof_join


@st.composite
def _asof_cases(draw):
    n_left = draw(st.integers(1, 10))
    n_right = draw(st.integers(0, 12))
    key = st.integers(1, 3)
    ts = st.integers(0, 20)
    left = [(i, draw(key), draw(ts)) for i in range(n_left)]  # (lid, k, ts)
    right = [
        (100 + i, draw(key), draw(ts), draw(st.integers(0, 99)))  # (rid, k, ts, val)
        for i in range(n_right)
    ]
    return left, right


def _ref(left, right):
    out = {}
    for lid, k, lts in left:
        cands = [(rts, rid, val) for rid, rk, rts, val in right if rk == k and rts <= lts]
        if cands:
            rts, rid, val = max(cands)  # latest ts, then greatest rid
            out[lid] = (rts, rid, val)
        else:
            out[lid] = (None, None, None)
    return out


@settings(
    max_examples=fuzz_examples(80, 30),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_asof_cases())
def test_asof_join_matches_reference_walk(spark, case):
    left, right = case
    ldf = spark.createDataFrame(left, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right, "rid long, k long, ts long, val long")
    got = {
        r["lid"]: (r["r_ts"], r["r_rid"], r["r_val"])
        for r in asof_join(ldf, rdf, "k", tiebreaker="rid").collect()
    }
    expected = _ref(left, right)
    assert got == expected, f"left={left}\nright={right}"
