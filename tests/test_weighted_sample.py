"""weighted_sample (Efraimidis–Spirakis) — pure-Python replay + properties.

The operator's whole value is determinism: the same (id, weight) rows must
be selected on every engine. The replay here recomputes the exact key chain
(md5 13-hex-prefix uniform, ln(u)/clamped-weight) in pure Python and checks
the selected ids AND ranks match; the statistical test checks the sample is
actually weight-leaning, not just deterministic.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _es_key(doc_id, weight) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
    u = (h + 1.0) / float(16**13)
    w = float(weight) if weight is not None else float("nan")
    if math.isnan(w) or w <= 0:  # invalid weights clamp to 1e-12 (maximally
        w = 1.0e-12               # unlikely); valid weights pass through
    return math.log(u) / w


def _expected(rows, k):
    """rows: (id, group, weight) → {(group, id): rank} for the top-k/group."""
    by_group: dict = {}
    for i, g, w in rows:
        by_group.setdefault(g, []).append((i, w))
    out = {}
    for g, members in by_group.items():
        ranked = sorted(members, key=lambda t: (-_es_key(t[0], t[1]), t[0]))
        for rk, (i, _) in enumerate(ranked[:k], start=1):
            out[(g, i)] = rk
    return out


def test_weighted_sample_matches_pure_python_replay(spark):
    from nextgenetl_spark.operators.sampling import weighted_sample

    rows = [(i, f"s{i % 3}", (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = {
        (r["source"], r["doc_id"]): r["sample_rank"]
        for r in weighted_sample(df, k=7).collect()
    }
    assert got == _expected(rows, 7)


def test_weighted_sample_clamps_only_invalid_weights(spark):
    """NULL / NaN / <=0 weights clamp to 1e-12 — maximally UNLIKELY, so
    they rank strictly AFTER every valid row — while valid weights,
    including fractional quality scores in (0,1), pass through untouched.
    (The r8 ADVICE bug clamped EVERY weight below 1 up to 1, turning
    fractional-weighted sampling uniform and letting NaN keys sort first
    under DESC; a 1.0 invalid-clamp would have been its mirror image,
    making junk rows the HEAVIEST in a fractional-weight corpus —
    round-9 self-review.)"""
    from nextgenetl_spark.operators.sampling import weighted_sample

    rows = [
        (1, "a", 0.0), (2, "a", None), (3, "a", 5.0), (4, "a", 9.0),
        (5, "a", float("nan")), (6, "a", -3.0), (7, "a", 0.25), (8, "a", 0.9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    out = weighted_sample(df, k=8).collect()
    # all rows survive (finite keys), ranks are a permutation of 1..8
    assert sorted(r["sample_rank"] for r in out) == list(range(1, 9))
    got = {(r["source"], r["doc_id"]): r["sample_rank"] for r in out}
    assert got == _expected(rows, 8)
    # every invalid-weight row (ids 1, 2, 5, 6) ranks after every valid row
    invalid_ranks = {got[("a", i)] for i in (1, 2, 5, 6)}
    valid_ranks = {got[("a", i)] for i in (3, 4, 7, 8)}
    assert max(valid_ranks) < min(invalid_ranks)


def test_weighted_sample_fractional_weights_lean_correctly(spark):
    """With fractional weights the heavier (0.9) row must beat the
    lighter (0.01) rows far more often than uniform would — i.e. the
    weights are NOT all clamped to 1. Analogous to the integer-weight
    leaning test: P(0.9 wins vs nine 0.01s) = 0.9/0.99 ≈ 0.91, so >100
    wins out of 200 groups is astronomically safe."""
    from nextgenetl_spark.operators.sampling import weighted_sample

    rows = []
    for g in range(200):
        for j in range(10):
            rows.append((g * 100 + j, f"g{g}", 0.9 if j == 0 else 0.01))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars double")
    picked = weighted_sample(df, k=1).collect()
    heavy_wins = sum(1 for r in picked if r["doc_id"] % 100 == 0)
    assert len(picked) == 200
    assert heavy_wins > 100  # expected ≈ 182; uniform would give ≈ 20


def test_weighted_sample_leans_toward_heavy_rows(spark):
    """Across many groups, a 50×-weight row should be selected (k=1) far
    more often than any individual light row — the weighting is real.
    With one heavy (w=50) vs nine light (w=1) rows, P(heavy wins) =
    50/59 ≈ 0.85; 200 groups make the <50% outcome astronomically
    unlikely (binomial tail < 1e-20), so the assertion is stable."""
    from nextgenetl_spark.operators.sampling import weighted_sample

    rows = []
    for g in range(200):
        for j in range(10):
            rows.append((g * 100 + j, f"g{g}", 50 if j == 0 else 1))
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    picked = weighted_sample(df, k=1).collect()
    heavy_wins = sum(1 for r in picked if r["doc_id"] % 100 == 0)
    assert len(picked) == 200
    assert heavy_wins > 100  # expected ≈ 170


def test_weighted_sample_rejects_internal_column_clash(spark):
    import pytest

    from nextgenetl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, "a", 2, 0.0)], ["doc_id", "source", "n_chars", "__es_key"])
    with pytest.raises(ValueError, match="__es_key"):
        weighted_sample(df, k=1)


def test_rrf_fuse_semantics(spark):
    """RRF ground truths on a hand-built pair of ranked lists: a doc in
    BOTH lists outscores a single-list doc with better ranks (the fusion
    property), scores are 1/(60+r) sums rounded to 6dp, ties break by id,
    and n_lists counts contributing lists."""
    from nextgenetl_spark.operators.textstats import rrf_fuse

    dense = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["query_id", "doc_id", "rank"]
    )
    lex = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 14, 3)], ["query_id", "doc_id", "rank"]
    )
    out = {r["doc_id"]: r for r in rrf_fuse([dense, lex], k=5).collect()}
    # doc 11 appears in both lists (ranks 2 and 1) -> top fused
    assert out[11]["rank"] == 1 and out[11]["n_lists"] == 2
    assert out[11]["rrf"] == round(1 / 62 + 1 / 61, 6)
    # singles: doc 10 (rank 1) and doc 13 (rank 2, other list): 1/61 > 1/62
    assert out[10]["rrf"] == round(1 / 61, 6) and out[10]["n_lists"] == 1
    assert out[10]["rank"] == 2  # 1/61 ties nothing; next after doc 11
    # equal-rrf tie (doc 12 rank 3 dense vs doc 14 rank 3 lex) -> id asc
    assert out[12]["rrf"] == out[14]["rrf"] == round(1 / 63, 6)
    assert out[12]["rank"] < out[14]["rank"]


def test_rrf_fuse_dedups_within_list(spark):
    """A malformed list carrying the same (query, doc) twice contributes
    only its BEST rank once — no double-counted term, no inflated
    n_lists (r8 ADVICE nit)."""
    from nextgenetl_spark.operators.textstats import rrf_fuse

    dup = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 3), (1, 11, 2)], ["query_id", "doc_id", "rank"]
    )
    other = spark.createDataFrame([(1, 10, 2)], ["query_id", "doc_id", "rank"])
    out = {r["doc_id"]: r for r in rrf_fuse([dup, other], k=5).collect()}
    # doc 10: best rank 1 from the dup list (rank-3 entry dropped) + rank 2
    assert out[10]["rrf"] == round(1 / 61 + 1 / 62, 6)
    assert out[10]["n_lists"] == 2
    assert out[11]["rrf"] == round(1 / 62, 6) and out[11]["n_lists"] == 1
