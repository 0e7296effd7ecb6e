"""PII scrub + sequence-packing operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_redact_and_counts(spark):
    from nextgenetl_spark.operators.pii import scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@foo.org or call 555-123-4567"),
            (2, "server 192.168.0.1 holds ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in scrub(df).collect()}
    assert out[1]["text"] == "mail me at [EMAIL] or call [PHONE]"
    assert out[1]["email_hits"] == 1 and out[1]["phone_hits"] == 1
    assert out[2]["text"] == "server [IP] holds ssn [SSN]"
    assert out[2]["ipv4_hits"] == 1 and out[2]["ssn_hits"] == 1
    assert out[3]["text"] == "nothing sensitive here"
    assert not out[3]["has_pii"] and out[1]["has_pii"] and out[2]["has_pii"]


def test_context_window_chunks_offsets(spark):
    from nextgenetl_spark.operators.packing import context_window_chunks

    rows = [("s", i, 400) for i in range(6)]  # stream of 6x400 tokens
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
    out = {r["doc_id"]: r["window_id"] for r in context_window_chunks(df, budget=1024).collect()}
    # starts: 0,400,800,1200,1600,2000 -> windows 0,0,0,1,1,1
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_greedy_bin_pack_matches_sequential_reference(spark):
    import random

    from nextgenetl_spark.operators.packing import greedy_bin_pack

    rng = random.Random(7)
    rows = [(f"s{i % 3}", i, rng.randint(1, 700)) for i in range(90)]
    # plant an oversized doc: must occupy a bin alone
    rows.append(("s0", 90, 5000))
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
    got = {(r["source"], r["doc_id"]): r["bin_id"] for r in greedy_bin_pack(df, budget=1024).collect()}

    # sequential next-fit reference
    expect = {}
    for src in sorted({s for s, _, _ in rows}):
        docs = sorted((d, t) for s, d, t in rows if s == src)
        bin_id, fill = 0, 0
        for d, t in docs:
            if fill > 0 and fill + t > 1024:
                bin_id, fill = bin_id + 1, 0
            expect[(src, d)] = bin_id
            fill += t
    assert got == expect
    # every bin except possibly a bin holding one oversized doc stays <= budget
    by_bin = {}
    for (src, d), b in got.items():
        tok = next(t for s, dd, t in rows if s == src and dd == d)
        by_bin.setdefault((src, b), []).append(tok)
    for toks in by_bin.values():
        assert sum(toks) <= 1024 or len(toks) == 1


def test_temperature_budget_sample_flattens_the_mix(spark):
    """alpha=0.5 up-weights small sources: the small source's kept-token
    FRACTION must exceed the big source's, while absolute budgets still
    order big > small; alpha=1 degenerates to proportional budgets."""
    from pyspark.sql import functions as F

    from nextgenetl_spark.operators.sampling import temperature_budget_sample

    rows = [(i, "big", 10) for i in range(100)] + [(i + 1000, "small", 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = temperature_budget_sample(df, base_budget=400, alpha=0.5)
    kept = {r["source"]: r for r in out.groupBy("source").agg(
        F.sum("n_tokens").alias("k"), F.max("budget").alias("b")).collect()}
    # big: budget 400 of 1000 tokens (40%); small: floor(400*sqrt(0.1))=126
    # of 100 tokens -> everything kept (100%)
    assert kept["big"]["b"] == 400 and kept["small"]["b"] == 126
    assert kept["small"]["k"] / 100 > kept["big"]["k"] / 1000  # flattened
    # determinism: same call -> identical kept set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in temperature_budget_sample(df, base_budget=400, alpha=0.5).collect()}
    assert a == b

def test_token_budget_sample_rejects_internal_column_clash(spark):
    """Round-6 ADVICE: inputs already carrying __bkt/__bw/__off would be
    silently overwritten inside the running-sum bucketing — the guard must
    fail loudly instead."""
    import pytest

    from nextgenetl_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(1, "a", 10, "x")], "doc_id long, source string, n_tokens long, __bkt string"
    )
    with pytest.raises(ValueError, match="__bkt"):
        token_budget_sample(df, budget=100)
