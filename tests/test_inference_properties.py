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


# --- round-2 additions: schema JSON round-trip + pipeline SQL templating ---

from hypothesis import given, settings
from hypothesis import strategies as st


_scalar_types = st.sampled_from(
    ["STRING", "INT64", "FLOAT64", "BOOL", "DATE", "TIMESTAMP", "NUMERIC"]
)
_names = st.from_regex(r"[a-z][a-z0-9_]{0,15}", fullmatch=True)


def _field(depth):
    scalar = st.fixed_dictionaries(
        {"name": _names, "type": _scalar_types, "mode": st.sampled_from(["NULLABLE", "REPEATED"])}
    )
    if depth <= 0:
        return scalar
    record = st.fixed_dictionaries(
        {
            "name": _names,
            "type": st.just("RECORD"),
            "mode": st.sampled_from(["NULLABLE", "REPEATED"]),
            "fields": st.lists(_field(depth - 1), min_size=1, max_size=3, unique_by=lambda f: f["name"]),
        }
    )
    return st.one_of(scalar, record)


@given(st.lists(_field(2), min_size=1, max_size=6, unique_by=lambda f: f["name"]))
@settings(max_examples=80, deadline=None)
def test_schema_fields_roundtrip_property(fields):
    """fields -> StructType -> fields preserves name/type/mode structure
    (descriptions default in; TIME/DATETIME aliases excluded — documented
    canonicalization)."""
    from nextgenetl_spark.schemas import fields_to_schema, schema_to_fields

    st_ = fields_to_schema(fields)
    back = schema_to_fields(st_)

    def strip(fs):
        out = []
        for f in fs:
            e = {"name": f["name"], "type": f["type"], "mode": f.get("mode", "NULLABLE")}
            if f["type"] == "RECORD":
                e["fields"] = strip(f["fields"])
            out.append(e)
        return out

    assert strip(back) == strip(fields)


@given(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80),
    st.dictionaries(_names, st.integers(-1000, 1000), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_render_sql_only_touches_known_params(sql, params):
    """render_sql replaces exactly the {known_param} tokens; every other
    character (including stray braces) passes through verbatim."""
    import re

    from nextgenetl_spark.plans.pipeline import render_sql

    out = render_sql(sql, params)
    expect = re.sub(
        r"\{([A-Za-z_][A-Za-z0-9_]*)\}",
        lambda m: str(params[m.group(1)]) if m.group(1) in params else m.group(0),
        sql,
    )
    assert out == expect
    if not re.search(r"\{[A-Za-z_][A-Za-z0-9_]*\}", sql):
        assert out == sql  # brace-free or non-param braces: identity
