"""Property fuzz of the connected-components operators.

Hypothesis generates random undirected pair graphs (including self-loops,
duplicate edges, long chains, and disconnected singleton-free node sets —
the real shapes LSH pair output takes), and BOTH distributed algorithms —
iterative min-label propagation and large/small-star contraction
(``operators/dedup.py``) — must produce exactly the partition a Python
union-find computes, with every label the component's minimum node id.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

from nextgenetl_spark.operators.dedup import connected_components, connected_components_star


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    return {n: root for root, members in comps.items() for n in members}


@st.composite
def _graphs(draw):
    n_nodes = draw(st.integers(2, 40))
    nodes = st.integers(0, n_nodes - 1)
    edges = draw(st.lists(st.tuples(nodes, nodes), min_size=1, max_size=60))
    if draw(st.booleans()):
        # splice in a long chain — the worst case for naive propagation
        start = n_nodes
        edges += [(start + i, start + i + 1) for i in range(draw(st.integers(3, 15)))]
    return edges


@settings(
    max_examples=fuzz_examples(60, 20),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_graphs())
def test_connected_components_match_union_find(spark, edges):
    expected = _union_find(edges)
    df = spark.createDataFrame(edges, "a_id: long, b_id: long")
    got_prop = {r["node"]: r["label"] for r in connected_components(df).collect()}
    got_star = {r["node"]: r["label"] for r in connected_components_star(df).collect()}
    assert got_prop == expected, f"label-prop diverged on {sorted(set(edges))}"
    assert got_star == expected, f"star contraction diverged on {sorted(set(edges))}"
