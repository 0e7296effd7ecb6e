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
    w = max(float(weight if weight is not None else 0.0), 1.0)
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


def test_weighted_sample_clamps_zero_and_null_weights(spark):
    from nextgenetl_spark.operators.sampling import weighted_sample

    rows = [(1, "a", 0), (2, "a", None), (3, "a", 5), (4, "a", 9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = weighted_sample(df, k=4).collect()
    # all rows survive (finite keys), ranks are a permutation of 1..4
    assert sorted(r["sample_rank"] for r in out) == [1, 2, 3, 4]
    assert {(r["source"], r["doc_id"]): r["sample_rank"] for r in out} == _expected(
        [(1, "a", 0), (2, "a", None), (3, "a", 5), (4, "a", 9)], 4
    )


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
