"""Flattening-engine tests on the F7-style nested clinical fixture
(FIXTURES.md: case → project/demographic/diagnoses→treatments/
follow_ups→molecular_tests)."""

from __future__ import annotations

import pytest

from nextgenetl_spark.flatten import FlattenConfig, flatten, melt_quant_matrix, program_structure
from nextgenetl_spark.sources.jsonl import records_to_df

CASES = [
    {
        "case_id": "c1",
        "submitter_id": "S1",
        "demographic": {"demographic_id": "d1", "gender": "female", "year_of_birth": 1970},
        "project": [{"project_id": "TCGA-OV", "name": "Ovarian"}],
        "diagnoses": [
            {
                "diagnosis_id": "dx1",
                "primary_diagnosis": "carcinoma",
                "age_at_diagnosis": 52,
                "treatments": [
                    {"treatment_id": "t1", "treatment_type": "chemo"},
                    {"treatment_id": "t2", "treatment_type": "radiation"},
                ],
            },
            {"diagnosis_id": "dx2", "primary_diagnosis": "sarcoma", "age_at_diagnosis": 60},
        ],
        "follow_ups": [
            {"follow_up_id": "f1", "days_to_follow_up": 100,
             "molecular_tests": [{"molecular_test_id": "m1", "gene_symbol": "TP53"}]},
            {"follow_up_id": "f2", "days_to_follow_up": 200},
        ],
    },
    {
        "case_id": "c2",
        "submitter_id": "S2",
        "demographic": {"demographic_id": "d2", "gender": "male", "year_of_birth": 1980},
        "project": [{"project_id": "TCGA-BR", "name": "Breast"}],
        "diagnoses": [
            {"diagnosis_id": "dx3", "primary_diagnosis": "melanoma", "age_at_diagnosis": 41}
        ],
    },
]

CONFIG = FlattenConfig(
    base="cases",
    id_keys={
        "cases": "case_id",
        "cases.project": "project_id",
        "cases.diagnoses": "diagnosis_id",
        "cases.diagnoses.treatments": "treatment_id",
        "cases.follow_ups": "follow_up_id",
        "cases.follow_ups.molecular_tests": "molecular_test_id",
    },
    prefixes={"diagnoses": "diag", "treatments": "treat", "follow_ups": "fu",
              "molecular_tests": "mt", "demographic": "demo", "project": "proj"},
)


@pytest.fixture(scope="module")
def nested_df(spark):
    return records_to_df(spark, CASES)


def test_program_structure(spark, nested_df):
    s = program_structure(nested_df, CONFIG)
    assert s["cases.project"] == 1
    assert s["cases.diagnoses"] == 2
    assert s["cases.diagnoses.treatments"] == 2
    assert s["cases.follow_ups"] == 2
    assert s["cases.follow_ups.molecular_tests"] == 1


def test_flatten_tables(spark, nested_df):
    tables = flatten(nested_df, CONFIG)
    assert set(tables) == {"cases", "cases_diagnoses", "cases_diagnoses_treatments", "cases_follow_ups"}

    base = {r["case_id"]: r.asDict() for r in tables["cases"].collect()}
    # Y2: single-entry project inlined; plain-struct demographic inlined
    assert base["c1"]["proj__project_id"] == "TCGA-OV"
    assert base["c1"]["demo__gender"] == "female"
    # Y3: counts for one-to-many groups, zero-filled
    assert base["c1"]["diag__count"] == 2 and base["c1"]["fu__count"] == 2
    assert base["c2"]["diag__count"] == 1 and base["c2"]["fu__count"] == 0

    diag = {r["diag__diagnosis_id"]: r.asDict() for r in tables["cases_diagnoses"].collect()}
    # Y1: base id propagated; nested one-to-many gets count on its parent row
    assert diag["dx1"]["case_id"] == "c1" and diag["dx1"]["diag__treat__count"] == 2
    assert diag["dx2"]["diag__treat__count"] == 0
    assert diag["dx3"]["case_id"] == "c2"

    treat = {r["diag__treat__treatment_id"]: r.asDict() for r in tables["cases_diagnoses_treatments"].collect()}
    # Y1: both base id AND immediate parent id carried
    assert treat["t1"]["case_id"] == "c1" and treat["t1"]["diag__diagnosis_id"] == "dx1"
    assert treat["t2"]["diag__treat__treatment_type"] == "radiation"

    fu = {r["fu__follow_up_id"]: r.asDict() for r in tables["cases_follow_ups"].collect()}
    # single-entry grandchild molecular_tests inlined into follow_ups rows
    assert fu["f1"]["fu__mt__gene_symbol"] == "TP53"
    assert fu["f2"]["fu__mt__gene_symbol"] is None


def test_flatten_excluded_fields(spark, nested_df):
    cfg = FlattenConfig(
        base=CONFIG.base, id_keys=CONFIG.id_keys, prefixes=CONFIG.prefixes,
        excluded={"cases": ["submitter_id"], "cases.diagnoses": ["age_at_diagnosis"]},
    )
    tables = flatten(nested_df, cfg)
    assert "submitter_id" not in tables["cases"].columns
    assert "diag__age_at_diagnosis" not in tables["cases_diagnoses"].columns


def test_melt_quant_matrix(spark):
    df = spark.createDataFrame(
        [("TP53", 1.5, -0.3), ("KRAS:S123", 0.0, 2.25)],
        ["gene", "run1:aliq1", "run2:aliq2"],
    )
    out = melt_quant_matrix(df, "gene", study_name="ST1")
    rows = {(r["gene_symbol"], r["aliquot_run_metadata_id"]): r for r in out.collect()}
    assert rows[("TP53", "run1")]["protein_abundance_log2ratio"] == 1.5
    assert rows[("TP53", "run1")]["aliquot_submitter_id"] == "aliq1"
    assert rows[("KRAS:S123", "run2")]["protein_abundance_log2ratio"] == 2.25
    assert out.columns == ["aliquot_run_metadata_id", "aliquot_submitter_id", "gene_symbol",
                           "protein_abundance_log2ratio", "study_name"]
