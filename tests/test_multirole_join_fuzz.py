"""Differential fuzz of the reference-width join pattern (J2).

``clinical_wide_join`` pins ONE 20-relation instance of the TP53 view
shape; this fuzz varies the shape itself — random chains of dictionary
roles where the SAME dim table is re-joined under multiple aliases, join
keys are either true FKs or DERIVED coded values (the ``Genetic_code ON
Mutant_codon`` pattern), dict-of-dict hops, and random INNER/LEFT mixes —
and checks the Spark plan against an independently-computed pandas oracle
(plain dict lookups, no Spark/SQL shared machinery).

What this hunts that the pinned query cannot: Catalyst join-reorder /
alias-resolution bugs that only appear for specific role counts or
key-expression shapes, LEFT-join null propagation through later INNER
roles, and truncation-vs-rounding divergence in derived keys.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

N_DIM = 25  # fixed-size dictionary (nation-shaped)


@st.composite
def join_shapes(draw):
    """A random role chain: each role is
    (key_kind, how, dict_of_dict) where key_kind picks the fact column /
    derivation the dim decodes."""
    n_roles = draw(st.integers(2, 8))
    roles = []
    for _ in range(n_roles):
        key_kind = draw(st.sampled_from(["fk", "mod_qty", "mod_price", "shift_fk"]))
        how = draw(st.sampled_from(["inner", "left", "left"]))
        dict_of_dict = draw(st.booleans())
        roles.append((key_kind, how, dict_of_dict))
    n_fact = draw(st.integers(1, 40))
    fact = []
    for i in range(n_fact):
        fact.append(
            {
                "f_id": i,
                "f_fk": draw(st.integers(0, N_DIM + 4)),  # some miss the dim
                "f_qty": draw(st.integers(0, 120)),
                "f_price": round(draw(st.integers(0, 40000)) / 100.0, 2),
            }
        )
    return roles, fact


def _derived_key(kind: str, row: dict) -> int | None:
    if kind == "fk":
        return row["f_fk"]
    if kind == "mod_qty":
        return row["f_qty"] % N_DIM
    if kind == "mod_price":
        # ROUND before truncating — the cross-engine rule clinical_wide_join
        # documents (Spark casts truncate, other engines round)
        return int(round(row["f_price"] * 100)) % N_DIM
    if kind == "shift_fk":
        return row["f_fk"] + 1
    raise AssertionError(kind)


def _spark_key(kind: str):
    if kind == "fk":
        return F.col("f.f_fk")
    if kind == "mod_qty":
        return F.col("f.f_qty") % N_DIM
    if kind == "mod_price":
        return F.round(F.col("f.f_price") * 100).cast("long") % N_DIM
    if kind == "shift_fk":
        return F.col("f.f_fk") + 1
    raise AssertionError(kind)


def _dims(spark):
    # dict: (d_key, d_name, d_group); group dict: (g_key, g_name)
    dim = spark.createDataFrame(
        [(k, f"D{k}", k % 5) for k in range(N_DIM)], ["d_key", "d_name", "d_group"]
    )
    grp = spark.createDataFrame([(g, f"G{g}") for g in range(5)], ["g_key", "g_name"])
    return dim, grp


DIM_ROWS = {k: (f"D{k}", k % 5) for k in range(N_DIM)}
GRP_ROWS = {g: f"G{g}" for g in range(5)}


def _oracle(roles, fact):
    out = []
    for row in fact:
        vals = [row["f_id"]]
        alive = True
        for i, (kind, how, dd) in enumerate(roles):
            key = _derived_key(kind, row)
            hit = DIM_ROWS.get(key)
            if hit is None:
                if how == "inner":
                    alive = False
                    break
                vals.append(None)
                if dd:
                    vals.append(None)
            else:
                name, group = hit
                vals.append(name)
                if dd:
                    # group dict always hits (groups are dense 0..4)
                    vals.append(GRP_ROWS[group])
        if alive:
            out.append(tuple(vals))
    return out


@settings(
    max_examples=fuzz_examples(40, 20),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=join_shapes())
def test_multirole_derived_key_joins(spark, case):
    roles, fact = case
    dim, grp = _dims(spark)
    f = spark.createDataFrame(
        [(r["f_id"], r["f_fk"], r["f_qty"], r["f_price"]) for r in fact],
        ["f_id", "f_fk", "f_qty", "f_price"],
    ).alias("f")

    df = f
    out_cols = [F.col("f.f_id").alias("f_id")]
    for i, (kind, how, dd) in enumerate(roles):
        d_alias, g_alias = f"d{i}", f"g{i}"
        df = df.join(
            F.broadcast(dim.alias(d_alias)),
            _spark_key(kind) == F.col(f"{d_alias}.d_key"),
            how,
        )
        out_cols.append(F.col(f"{d_alias}.d_name").alias(f"name_{i}"))
        if dd:
            # dict-of-dict hop inherits the role's join type so a LEFT
            # miss stays a single null-extended row instead of being
            # dropped by an inner group hop
            df = df.join(
                F.broadcast(grp.alias(g_alias)),
                F.col(f"{d_alias}.d_group") == F.col(f"{g_alias}.g_key"),
                how,
            )
            out_cols.append(F.col(f"{g_alias}.g_name").alias(f"group_{i}"))
    got = sorted(tuple(r) for r in df.select(*out_cols).collect())
    want = sorted(_oracle(roles, fact))
    assert got == want, f"roles={roles}\nfact_n={len(fact)}\ngot={got[:5]}\nwant={want[:5]}"
