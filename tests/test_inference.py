"""Tier-1 unit tests for the type/normalization engine (SURVEY.md §5).

Assertions pin the LIVE reference behavior (cda_bq_etl/data_helpers.py),
verified by differential fuzzing (3k values, full lattice sweep, 0
mismatches). Note the reference's own tests/common_etl/test_utils.py is
stale where it disagrees ('1'→BOOL there; the live code and we return INT64).
"""

from __future__ import annotations

import datetime
import math

import pytest

from nextgenetl_spark.inference import (
    check_value_type,
    dedupe_headers,
    infer_schema,
    is_int_like,
    make_name_bq_friendly,
    normalize_value,
    resolve_type_conflict,
)


CHECK_TABLE = {
    # leading-zero ids stay strings; trivial floats collapse to ints
    "000": "STRING",
    "007": "STRING",
    "0.0": "INT64",
    "100": "INT64",
    "-5403": "INT64",
    "-10001.0": "INT64",
    "0.001": "FLOAT64",
    "5.01": "FLOAT64",
    "5.00": "INT64",
    # NaN / infinity
    "NaN": "FLOAT64",
    "nan": "FLOAT64",
    "inf": "FLOAT64",
    "-inf": "FLOAT64",
    "Infinity": "FLOAT64",
    # integral scientific notation is integral (live behavior)
    "2.01803E+13": "INT64",
    "1E-3": "FLOAT64",
    # strings
    "Hi": "STRING",
    "0.1.1": "STRING",
    "1.1.1": "STRING",
    "111-222": "STRING",
    # dates / times / timestamps
    "2000-12-31": "DATE",
    "2000-1-1": "DATE",
    "9:03:22.0001": "TIME",
    "09:03:22": "TIME",
    "9:3:22": "TIME",
    "2019-05-01T13:44:50.898263-05:00": "TIMESTAMP",
    "2019-05-01 13:44:50.898263": "TIMESTAMP",
    "2019-5-1T13:44:50.898263": "TIMESTAMP",
    "1996-13-45": "STRING",
    # bools: words yes — bare 1/0 are INT64 (live behavior)
    "True": "BOOL",
    "False": "BOOL",
    "yes": "BOOL",
    "no": "BOOL",
    "true": "BOOL",
    "false": "BOOL",
    "1": "INT64",
    "0": "INT64",
}


@pytest.mark.parametrize("value,expected", CHECK_TABLE.items())
def test_check_value_type_strings(value, expected):
    assert check_value_type(value) == expected


def test_check_value_type_python_objects():
    assert check_value_type(True) == "BOOL"
    assert check_value_type(1) == "INT64"
    assert check_value_type(1.5) == "FLOAT64"
    assert check_value_type(100.0) == "INT64"  # trivial float
    assert check_value_type(float("nan")) == "FLOAT64"
    assert check_value_type([1, 2]) == "ARRAY"
    assert check_value_type({"a": 1}) == "RECORD"
    assert check_value_type(None) is None
    assert check_value_type("") is None
    assert check_value_type(datetime.date(2020, 1, 1)) == "DATE"
    assert check_value_type(datetime.datetime(2020, 1, 1)) == "TIMESTAMP"
    assert check_value_type(datetime.time(1, 2)) == "TIME"


def test_normalize_value_null_vocab():
    for marker in ["na", "N/A", "None", "", "--", "-", "null", "Not Reported",
                   "unknown", "[Not Available]", "[not applicable]", "[Unknown]", "."]:
        assert normalize_value(marker) is None, marker
    assert normalize_value("--", is_tsv=True) == ""


def test_normalize_value_bools_are_strings():
    # the reference normalizes to the STRINGS 'True'/'False'
    assert normalize_value("yes") == "True"
    assert normalize_value("TRUE") == "True"
    assert normalize_value("no") == "False"
    assert normalize_value("false") == "False"


def test_normalize_value_trivial_floats():
    assert normalize_value(100.0) == 100 and isinstance(normalize_value(100.0), int)
    assert normalize_value("100.0") == 100
    assert normalize_value("0.5") == "0.5"  # non-integral stays as-is
    assert normalize_value(" padded ") == "padded"
    assert normalize_value("007") == "007"  # leading-zero id survives


def test_is_int_like():
    assert is_int_like(5) and is_int_like("5") and is_int_like("5.0") and is_int_like(5.0)
    assert not is_int_like(True) and not is_int_like("007")
    assert not is_int_like("5.5") and not is_int_like(float("nan")) and not is_int_like("x")


LATTICE = [
    ("x", set(), "STRING"),
    ("x", {"FLOAT64", "INT64", "NUMERIC"}, "FLOAT64"),
    ("x", {"INT64", "NUMERIC"}, "NUMERIC"),
    ("x", {"STRING", "BOOL"}, "STRING"),
    ("x", {"INT64", "BOOL"}, "INT64"),           # live behavior (stale test says raise)
    ("x", {"INT64", "BOOL", "FLOAT64"}, "FLOAT64"),
    ("x", {"DATE", "TIMESTAMP"}, "DATETIME"),
    ("x", {"DATE", "TIME"}, "STRING"),
    ("x", {"DATE", "INT64"}, "STRING"),
    ("x", {"BOOL", "DATE"}, "DATETIME"),          # quirk: BOOL doesn't block datetime merge
    ("case_id", {"INT64"}, "STRING"),             # *_id forced to STRING
    ("foo_id_bar", {"INT64"}, "STRING"),          # substring match, per reference
    ("x", {"INT64", None}, "INT64"),
]


@pytest.mark.parametrize("field,types,expected", LATTICE)
def test_resolve_type_conflict(field, types, expected):
    assert resolve_type_conflict(field, types) == expected


def test_resolve_type_conflict_fatal():
    with pytest.raises(TypeError):
        resolve_type_conflict("x", {"STRING", "ARRAY"})
    with pytest.raises(TypeError):
        resolve_type_conflict("x", {"RECORD", "INT64"})


def test_infer_schema_nested():
    records = [
        {"case_id": "001", "age": "42.0", "flags": ["yes", "no"],
         "diagnoses": [{"code": "7", "score": "1.5"}]},
        {"case_id": "002", "age": "--", "extra": "2020-01-01",
         "diagnoses": [{"code": "x"}]},
    ]
    st = infer_schema(records)
    by_name = {f.name: f for f in st.fields}
    assert by_name["case_id"].dataType.simpleString() == "string"   # _id rule
    assert by_name["age"].dataType.simpleString() == "bigint"       # 42.0 → int; '--' → null
    assert by_name["extra"].dataType.simpleString() == "date"
    assert by_name["flags"].dataType.simpleString() == "array<boolean>"
    diag = by_name["diagnoses"].dataType
    inner = {f.name: f.dataType.simpleString() for f in diag.elementType.fields}
    assert inner == {"code": "string", "score": "double"}  # '7'+'x' → string; 1.5 → double


def test_header_utils():
    assert make_name_bq_friendly("a b/c-d") == "a_b_c_d"
    assert dedupe_headers(["a", "b", "a", "a"]) == ["a", "b", "a_1", "a_2"]


def test_schema_json_roundtrip_nested(tmp_path):
    """StructType -> reference {"fields":[...]} JSON -> StructType must be
    identity, including RECORD nesting and REPEATED arrays."""
    from pyspark.sql import types as T

    from nextgenetl_spark.schemas import load_schema, save_schema

    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("when", T.TimestampType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("child", T.StructType([
            T.StructField("k", T.StringType(), True),
            T.StructField("vals", T.ArrayType(T.LongType(), True), True),
        ]), True),
        T.StructField("children", T.ArrayType(T.StructType([
            T.StructField("cid", T.LongType(), True),
        ]), True), True),
    ])
    p = str(tmp_path / "schema.json")
    save_schema(p, schema)
    assert load_schema(p) == schema


def test_schema_flat_types_roundtrip(tmp_path):
    from nextgenetl_spark.schemas import load_schema_types, save_schema

    types = {"a": "STRING", "b": "INT64", "c": "FLOAT64", "d": "BOOL", "e": "DATE"}
    p = str(tmp_path / "flat.json")
    save_schema(p, types, descriptions={"a": "primary key"})
    assert load_schema_types(p) == types
    import json

    fields = json.load(open(p))["fields"]
    by = {f["name"]: f for f in fields}
    assert by["a"]["description"] == "primary key"
    assert by["b"]["description"] == "No description"


def test_merge_curated_policies():
    from nextgenetl_spark.schemas import merge_curated

    inferred = {"id": "INT64", "bal": "FLOAT64", "code": "STRING"}
    curated = [
        {"name": "id", "type": "STRING", "description": "case id"},
        {"name": "bal", "type": "NUMERIC", "description": "balance", "exception": "drift"},
    ]
    # build_combined_schema policy: inferred type wins, description kept
    merged = {f["name"]: f for f in merge_curated(inferred, curated)}
    assert merged["id"]["type"] == "INT64" and merged["id"]["description"] == "case id"
    assert merged["code"]["description"] == "No description"
    # create_schema_hold_list static policy: curated wins unless exception
    static = {f["name"]: f for f in merge_curated(inferred, curated, prefer_curated_types=True)}
    assert static["id"]["type"] == "STRING"
    assert static["bal"]["type"] == "FLOAT64"  # exception -> dynamic type stands
    assert "exception" not in static["bal"]


def test_read_tsv_persisted_schema_matches_inferred(spark, tmp_path):
    from nextgenetl_spark.sources.tsv import read_tsv

    f = tmp_path / "t.tsv"
    f.write_text("id\tname\tbal\n001\talpha\t1.5\n002\tbeta\t2.0\n")
    sp = str(tmp_path / "schema.json")
    first = read_tsv(spark, str(f), schema_path=sp)
    assert (tmp_path / "schema.json").exists()
    second = read_tsv(spark, str(f), schema_path=sp)
    assert first.schema == second.schema
    assert sorted(map(tuple, first.collect())) == sorted(map(tuple, second.collect()))


def test_read_jsonl_persisted_schema_matches_inferred(spark, tmp_path):
    from nextgenetl_spark.sources.jsonl import read_jsonl

    f = tmp_path / "d.jsonl"
    f.write_text('{"id": 1, "tags": ["a"], "meta": {"k": "v"}}\n{"id": 2, "tags": [], "meta": {"k": "w"}}\n')
    sp = str(tmp_path / "schema.json")
    first = read_jsonl(spark, str(f), schema_path=sp)
    second = read_jsonl(spark, str(f), schema_path=sp)
    assert first.schema == second.schema
    assert sorted(map(str, first.collect())) == sorted(map(str, second.collect()))


def test_read_tsv_curated_overlay(spark, tmp_path):
    """Curated entries override inferred types (static mode, honoring
    exceptions), contribute descriptions, and the persisted schema carries
    the merged fields — the reference's build_combined_schema flow."""
    import json

    from nextgenetl_spark.sources.tsv import read_tsv

    f = tmp_path / "t.tsv"
    f.write_text("id\tqty\tnote\n7\t1\thello\n8\t2\tworld\n")
    curated = [
        {"name": "id", "type": "STRING", "description": "case id"},  # wins: 7 -> '7'
        {"name": "qty", "type": "STRING", "description": "count", "exception": "dynamic"},  # inference stands
    ]
    sp = str(tmp_path / "schema.json")
    df = read_tsv(spark, str(f), curated=curated, prefer_curated_types=True, schema_path=sp)
    assert dict(df.dtypes) == {"id": "string", "qty": "bigint", "note": "string"}
    assert {r["id"] for r in df.collect()} == {"7", "8"}

    fields = {x["name"]: x for x in json.load(open(sp))["fields"]}
    assert fields["id"]["type"] == "STRING" and fields["id"]["description"] == "case id"
    assert fields["qty"]["type"] == "INT64" and fields["qty"]["description"] == "count"
    assert fields["note"]["description"] == "No description"

    # reload path: second read uses the persisted merged schema, same result
    again = read_tsv(spark, str(f), schema_path=sp)
    assert again.schema == df.schema
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, df.collect()))
