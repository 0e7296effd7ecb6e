"""Property-based tests (hypothesis) for the inference engine — invariants
the example tables in test_inference.py can't cover exhaustively. The
reference has no property testing (SURVEY.md §5); these pin algebraic laws
of the type lattice and normalizer that any refactor must preserve."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from nextgenetl_spark.inference import (
    check_value_type,
    dedupe_headers,
    make_name_bq_friendly,
    normalize_value,
    resolve_type_conflict,
)

SCALAR_TYPES = ["STRING", "INT64", "FLOAT64", "NUMERIC", "BOOL", "DATE", "TIME", "TIMESTAMP", "DATETIME"]
type_sets = st.sets(st.sampled_from(SCALAR_TYPES), min_size=1, max_size=5)
field_names = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12)


@given(field_names, type_sets)
@settings(max_examples=300, deadline=None)
def test_resolve_conflict_total_and_deterministic(field, types):
    """The lattice is total over scalar-type sets and pure."""
    out = resolve_type_conflict(field, set(types))
    assert out in SCALAR_TYPES
    assert resolve_type_conflict(field, set(types)) == out


@given(field_names, type_sets)
@settings(max_examples=300, deadline=None)
def test_resolve_conflict_order_insensitive(field, types):
    """Result must not depend on set iteration order (the reference iterates
    a Python set — a real hazard its own tests never caught)."""
    as_list = sorted(types)
    assert resolve_type_conflict(field, set(as_list)) == resolve_type_conflict(field, set(reversed(as_list)))


@given(type_sets)
@settings(max_examples=200, deadline=None)
def test_id_fields_always_string(types):
    assert resolve_type_conflict("case_id", set(types)) == "STRING"


@given(st.sets(st.sampled_from(SCALAR_TYPES), min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_string_member_absorbs(types):
    assert resolve_type_conflict("f", set(types) | {"STRING"}) == "STRING"


@given(st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_on_strings(s):
    """normalize(normalize(x)) == normalize(x) — ingest may be re-run."""
    once = normalize_value(s)
    assert normalize_value(once) == once


@given(st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_checked_type_is_stable_under_normalize(s):
    """A normalized value never maps to a *different* non-null scalar family
    in a way that breaks loading: the checked type of the normalized value is
    the type the schema will carry."""
    n = normalize_value(s)
    if n is not None:
        t = check_value_type(n) or "STRING"
        assert t in SCALAR_TYPES + ["ARRAY", "RECORD"]


@given(st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6), min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_dedupe_headers_unique_and_prefix_preserving(headers):
    out = dedupe_headers(headers)
    assert len(out) == len(headers)
    assert len(set(out)) == len(out)
    for orig, new in zip(headers, out):
        assert new == orig or new.startswith(orig + "_")


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=300, deadline=None)
def test_bq_friendly_names_are_legal(name):
    out = make_name_bq_friendly(name)
    assert len(out) <= 300
    assert all(c.isalnum() or c == "_" for c in out)
