"""Property fuzz of the ANN surface.

Random integer-component embedding sets (exact dot products, no float
flakes) check two identities:

- exact brute-force ``cosine_topk`` equals an independent numpy ranking
  under the operator's own contract (round sim to 4, rank by (-sim, id));
- ``ivf_topk`` with ``nprobe == k_centroids`` (full probe) degenerates to
  the exact brute-force result — the algebraic identity the IVF recall
  knob is built on.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

from nextgenetl_spark.operators.similarity import cosine_topk, ivf_topk


@st.composite
def _vector_sets(draw):
    dim = draw(st.integers(3, 8))
    nonzero = st.lists(st.integers(-5, 5), min_size=dim, max_size=dim).filter(
        lambda v: any(x != 0 for x in v)
    )
    n_corpus = draw(st.integers(5, 25))
    corpus = [(100 + i, draw(nonzero)) for i in range(n_corpus)]
    n_q = draw(st.integers(1, 3))
    queries = [(1000 + i, draw(nonzero)) for i in range(n_q)]
    k = draw(st.sampled_from([1, 3, 5]))
    return dim, corpus, queries, k


def _numpy_topk(queries, corpus, k):
    out = set()
    for qid, qv in queries:
        q = np.array(qv, dtype=float)
        scored = []
        for cid, cv in corpus:
            c = np.array(cv, dtype=float)
            sim = float(q @ c) / (float(np.linalg.norm(q)) * float(np.linalg.norm(c)))
            scored.append((round(sim, 4), cid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (sim, cid) in enumerate(scored[:k], start=1):
            out.add((qid, cid, sim, rank))
    return out


@settings(
    max_examples=fuzz_examples(40, 15),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_vector_sets())
def test_brute_force_topk_matches_numpy_and_full_probe_ivf(spark, case):
    dim, corpus, queries, k = case
    to_df = lambda rows, idc: spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], f"{idc} long, embedding array<double>"
    )
    qdf = to_df(queries, "query_id")
    cdf = to_df(corpus, "neighbor_id")

    brute = {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in cosine_topk(qdf, cdf, k=k).collect()
    }
    assert brute == _numpy_topk(queries, corpus, k), f"case={case}"

    full_probe = {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in ivf_topk(qdf, cdf, k_centroids=4, nprobe=4, k=k).collect()
    }
    assert full_probe == brute, f"full-probe IVF != brute force; case={case}"

@settings(
    max_examples=fuzz_examples(15, 6),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_vector_sets())
def test_ivf_recall_monotone_in_nprobe(spark, case):
    """The property the ANN_RECALL.json curves rely on (round-6 verdict ask
    #1): a larger nprobe probes a SUPERSET of cells per query, and the
    ranking contract is one fixed total order (-sim, id) — so any candidate
    that displaces a true-top-k member from the result must itself be in
    the true top-k, and recall@k can never decrease in nprobe. Deterministic
    (no statistical tolerance): this is an algebraic consequence, fuzzed
    over random corpora."""
    dim, corpus, queries, k = case
    to_df = lambda rows, idc: spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], f"{idc} long, embedding array<double>"
    )
    qdf = to_df(queries, "query_id")
    cdf = to_df(corpus, "neighbor_id")

    def sets(df):
        out = {}
        for r in df.select("query_id", "neighbor_id").collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = sets(cosine_topk(qdf, cdf, k=k))
    prev = -1.0
    for nprobe in (1, 2, 4):
        ann = sets(ivf_topk(qdf, cdf, k_centroids=4, nprobe=nprobe, k=k))
        rec = sum(len(ann.get(q, set()) & t) / k for q, t in truth.items()) / len(truth)
        assert rec >= prev - 1e-12, f"recall dropped at nprobe={nprobe}: {prev} -> {rec}; case={case}"
        prev = rec
    assert prev == 1.0, f"full probe (nprobe=k_centroids) must be exact; case={case}"
