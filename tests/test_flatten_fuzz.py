"""Differential fuzz of the nested-record flattener (Y1-Y3).

Hypothesis generates random case trees — nested array<struct> field groups
up to 3 levels deep with per-group cardinalities drawn from the data, null
and empty arrays, null scalars, excluded fields — and two INDEPENDENT
implementations flatten each one:

- the engine: ``nextgenetl_spark.flatten.flatten`` (distributed
  explode-chains + recursive single-entry inlining + in-plan counts);
- the oracle: a ~60-line row-wise Python walk implementing the reference's
  recursive algorithm directly (flatten_case_entry + merge into the
  closest one-to-many ancestor + count attachment,
  build_gdc_api_clinical_program_tables.py:749-939 — minus its
  falsy-value dropping, which the engine deliberately does not reproduce).

Every produced table must match on name set, column set, and the
driver-identical order-insensitive value hash. This fuzz is what caught
the single-under-single inlining gap fixed in flatten.py ``_single_cols``.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

from nextgenetl_spark.flatten import FlattenConfig, flatten

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check import table_hash  # noqa: E402


# ---- tree spec -------------------------------------------------------------
# A group spec is (name, scalars, max_card, children); scalars is a list of
# (field, typ) with typ in {"int", "str"}; max_card bounds the generated
# list lengths (the DATA's actual max decides single-vs-many, same as the
# engine's program_structure).


@st.composite
def _group(draw, name, depth):
    # "list" = array<long> — primitive-array fields pass through as raw
    # array columns wherever their group lands (inlined single OR child
    # table); round-5 ADVICE flagged that the fuzz never generated them
    scalars = draw(
        st.lists(
            st.sampled_from([("va", "int"), ("vb", "str"), ("vc", "int"), ("vd", "list")]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    max_card = draw(st.sampled_from([0, 1, 1, 3, 3]))
    children = []
    if depth < 3 and draw(st.booleans()):
        children.append(draw(_group(f"sg{depth}", depth + 1)))
    return (name, scalars, max_card, children)


@st.composite
def flatten_cases(draw):
    base_scalars = draw(
        st.lists(st.sampled_from([("s0", "str"), ("s1", "int")]), min_size=1, max_size=2, unique=True)
    )
    groups = [draw(_group("g0", 1))]
    if draw(st.booleans()):
        groups.append(draw(_group("g1", 1)))

    # excluded: sometimes drop one scalar of g0
    excluded = {}
    if draw(st.booleans()):
        excluded["cases.g0"] = [groups[0][1][0][0]]

    counter = [0]

    def _scalar(typ):
        if draw(st.booleans()):
            counter[0] += 1
            if typ == "list":
                return [] if draw(st.booleans()) else [counter[0], counter[0] + 7]
            return counter[0] if typ == "int" else f"v{counter[0]}"
        return None

    def _instances(spec):
        name, scalars, max_card, children = spec
        shape = draw(st.integers(-1, max_card))  # -1 → null array
        if shape < 0:
            return None
        out = []
        for _ in range(shape):
            counter[0] += 1
            rec = {f"{name}_id": counter[0]}
            for fld, typ in scalars:
                rec[fld] = _scalar(typ)
            for ch in children:
                rec[ch[0]] = _instances(ch)
            out.append(rec)
        return out

    n = draw(st.integers(1, 4))
    records = []
    for _ in range(n):
        counter[0] += 1
        rec = {"case_id": counter[0]}
        for fld, typ in base_scalars:
            rec[fld] = _scalar(typ)
        for g in groups:
            rec[g[0]] = _instances(g)
        records.append(rec)
    return base_scalars, groups, excluded, records


# ---- twin renderers ----------------------------------------------------------


def _group_schema(spec) -> T.ArrayType:
    name, scalars, _, children = spec
    fields = [T.StructField(f"{name}_id", T.LongType())]
    for fld, typ in scalars:
        fields.append(T.StructField(fld, _scalar_type(typ)))
    for ch in children:
        fields.append(T.StructField(ch[0], _group_schema(ch)))
    return T.ArrayType(T.StructType(fields))


def _scalar_type(typ) -> T.DataType:
    if typ == "list":
        return T.ArrayType(T.LongType())
    return T.LongType() if typ == "int" else T.StringType()


def _to_tuple(rec, schema: T.StructType):
    out = []
    for f in schema.fields:
        v = rec.get(f.name)
        if (
            isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StructType)
            and v is not None
        ):
            v = [_to_tuple(e, f.dataType.elementType) for e in v]
        out.append(v)  # primitive arrays pass through as plain lists
    return tuple(out)


def _config(groups, excluded):
    id_keys = {"cases": "case_id"}

    def walk(spec, path):
        id_keys[path] = f"{spec[0]}_id"
        for ch in spec[3]:
            walk(ch, f"{path}.{ch[0]}")

    for g in groups:
        walk(g, f"cases.{g[0]}")
    return FlattenConfig(base="cases", id_keys=id_keys, excluded=excluded)


def _structure(groups, records):
    """max cardinality per dotted path, from the data (oracle side)."""
    out = {}

    def walk(spec, path, instances):
        n = len(instances or [])
        out[path] = max(out.get(path, 0), n)
        for inst in instances or []:
            for ch in spec[3]:
                walk(ch, f"{path}.{ch[0]}", inst.get(ch[0]))

    for rec in records:
        for g in groups:
            walk(g, f"cases.{g[0]}", rec.get(g[0]))
    return out


def _colname(path, fld):
    p = "__".join(path.split(".")[1:])
    return f"{p}__{fld}" if p else fld


def _oracle_tables(base_scalars, groups, excluded, records):
    """Row-wise reference implementation: single-entry groups merge into
    the closest one-to-many ancestor (cascading), one-to-many groups get a
    child table plus a zero-filled __count on that ancestor."""
    structure = _structure(groups, records)
    many = {p for p, n in structure.items() if n > 1}
    tables = {"cases": []}
    for p in sorted(many):
        tables[p.replace(".", "_")] = []

    def inline(elem, spec, path, row):
        """Contribute spec's fields at path (single-entry, elem may be
        None) into row — the merge_single_entry_fgs cascade."""
        name, scalars, _, children = spec
        ex = excluded.get(path, [])
        for fld in [f"{name}_id"] + [f for f, _ in scalars]:
            if fld in ex:
                continue
            row[_colname(path, fld)] = elem.get(fld) if elem else None
        for ch in children:
            ch_path = f"{path}.{ch[0]}"
            n = structure.get(ch_path, 0)
            sub = (elem or {}).get(ch[0])
            if n > 1:
                row[_colname(ch_path, "count")] = len(sub or [])
            elif n == 1:
                inline((sub or [None])[0], ch, ch_path, row)

    def emit_children(case_id, parent_elem, parent_path, spec, path, instances):
        """Walk into a one-to-many group: each element becomes a child-table
        row carrying case_id + the immediate parent's id."""
        name, scalars, _, children = spec
        ex = excluded.get(path, [])
        for elem in instances or []:
            row = {"case_id": case_id}
            if parent_elem is not None:
                pid_fld = f"{parent_path.split('.')[-1]}_id"
                row[_colname(parent_path, pid_fld)] = parent_elem.get(pid_fld)
            for fld in [f"{name}_id"] + [f for f, _ in scalars]:
                if fld in ex:
                    continue
                row[_colname(path, fld)] = elem.get(fld)
            for ch in children:
                ch_path = f"{path}.{ch[0]}"
                n = structure.get(ch_path, 0)
                sub = elem.get(ch[0])
                if n > 1:
                    row[_colname(ch_path, "count")] = len(sub or [])
                elif n == 1:
                    inline((sub or [None])[0], ch, ch_path, row)
            tables[path.replace(".", "_")].append(row)
            for ch in children:
                descend(case_id, elem, path, ch, f"{path}.{ch[0]}", elem.get(ch[0]))

    def descend(case_id, parent_elem, parent_path, spec, path, instances):
        """Route a group's instances: many → child table rows; otherwise
        keep walking so many-groups nested under single parents still
        emit (the explode chain passes through cardinality-1 arrays)."""
        if path in many:
            emit_children(case_id, parent_elem, parent_path, spec, path, instances)
            return
        for elem in instances or []:
            for ch in spec[3]:
                descend(case_id, elem, path, ch, f"{path}.{ch[0]}", elem.get(ch[0]))

    for rec in records:
        row = {"case_id": rec["case_id"]}
        for fld, _typ in base_scalars:
            row[fld] = rec.get(fld)
        for g in groups:
            path = f"cases.{g[0]}"
            n = structure.get(path, 0)
            if n > 1:
                row[_colname(path, "count")] = len(rec.get(g[0]) or [])
            elif n == 1:
                inline((rec.get(g[0]) or [None])[0], g, path, row)
        tables["cases"].append(row)
        for g in groups:
            descend(rec["case_id"], None, "cases", g, f"cases.{g[0]}", rec.get(g[0]))

    return tables


@settings(
    max_examples=fuzz_examples(120, 60),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=flatten_cases())
def test_flatten_differential(spark, case):
    base_scalars, groups, excluded, records = case

    fields = [T.StructField("case_id", T.LongType())]
    for fld, typ in base_scalars:
        fields.append(T.StructField(fld, T.LongType() if typ == "int" else T.StringType()))
    for g in groups:
        fields.append(T.StructField(g[0], _group_schema(g)))
    schema = T.StructType(fields)

    df = spark.createDataFrame([_to_tuple(r, schema) for r in records], schema)
    engine = flatten(df, _config(groups, excluded))
    oracle = _oracle_tables(base_scalars, groups, excluded, records)

    assert sorted(engine) == sorted(oracle), f"table set {sorted(engine)} != {sorted(oracle)}"
    for tname, sdf in engine.items():
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        orows_dicts = oracle[tname]
        ocols = sorted({c for r in orows_dicts for c in r}) if orows_dicts else []
        # engine emits the full schema even for zero-row tables; compare
        # columns only when the oracle saw at least one row
        if orows_dicts:
            assert sorted(scols) == sorted(ocols), (
                f"{tname}: cols {sorted(scols)} != {sorted(ocols)}\nrecords={records}"
            )
        orows = [tuple(r.get(c) for c in scols) for r in orows_dicts]
        assert len(srows) == len(orows), f"{tname}: {len(srows)} != {len(orows)}\nrecords={records}"
        assert table_hash(srows, scols) == table_hash(orows, scols), (
            f"{tname}: value hash mismatch\nspark={sorted(srows)[:6]}\n"
            f"oracle={sorted(orows)[:6]}\nrecords={records}"
        )
