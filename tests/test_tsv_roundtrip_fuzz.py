"""Generative round-trip fuzz of the TSV export → read pipeline (S9).

Random typed DataFrames (long / double / string columns, nulls anywhere,
money-shaped doubles, random row counts including empty partitions) are
exported the way the Pipeline's ``export_csv`` step writes them — headered
delimited part files plus the ``_schema.json`` sidecar — and read back
with ``read_tsv(schema_path=sidecar)``. The sidecar-pinned reload must
reproduce the original rows and types EXACTLY, regardless of which part
file sorts first (the degenerate-first-file re-typing bug the sidecar
exists to prevent, round-3 verdict S9).

String values are drawn from a separator-free alphabet outside the
dialect's NORMALIZATION vocabulary, all of which is lossy by design at
ingest (reference Y7 value normalization, inference.py normalize_value):
NULL placeholders ("-", "n/a", "", ...) become NULL, yes/no/true/false
become canonical booleans, and integral-numeric strings ("0007",
"100.0") collapse to their integer form. Embedded tabs/newlines belong
to the quoted-CSV surface, not this dialect. Everything OUTSIDE that
vocabulary must survive the export -> sidecar-pinned reload bit-exactly
— the fuzz's first counterexample was the "-" sentinel, which is the
normalization working as specified, now excluded by construction.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import fuzz_examples

_COUNTER = [0]

_STRINGS = ["alpha", "b_2", "Zq9", "x y", "q-7", "#tag", "ß-umlaut", "v.1a"]


@st.composite
def _frames(draw):
    n_cols = draw(st.integers(1, 4))
    types = [draw(st.sampled_from(["long", "double", "string"])) for _ in range(n_cols)]
    n_rows = draw(st.integers(1, 12))
    rows = []
    for i in range(n_rows):
        row = [i]  # leading non-null id keeps rows distinguishable
        for t in types:
            if draw(st.integers(0, 3)) == 0:
                row.append(None)
            elif t == "long":
                row.append(draw(st.integers(-(10**12), 10**12)))
            elif t == "double":
                row.append(draw(st.integers(-400, 400)) * 0.25)
            else:
                row.append(draw(st.sampled_from(_STRINGS)))
        rows.append(tuple(row))
    return types, rows


@settings(
    max_examples=fuzz_examples(60, 25),
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_frames())
def test_tsv_export_sidecar_roundtrip(spark, case, tmp_path_factory):
    from nextgenetl_spark.schemas import save_schema
    from nextgenetl_spark.sources.tsv import read_tsv

    types, rows = case
    schema = "rid long, " + ", ".join(f"c{i} {t}" for i, t in enumerate(types))
    df = spark.createDataFrame(rows, schema)

    _COUNTER[0] += 1
    out = str(tmp_path_factory.mktemp("tsv_rt")) + f"/t{_COUNTER[0]}"
    # the Pipeline export_csv step's exact writer shape (plans/pipeline.py)
    df.write.mode("overwrite").options(header="true", sep="\t").csv(out)
    save_schema(os.path.join(out, "_schema.json"), df.schema)

    back = read_tsv(spark, out, schema_path=os.path.join(out, "_schema.json"))
    assert back.schema == df.schema, f"schema drift: {back.schema} != {df.schema}"
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(rows)
    assert got == want, f"types={types}\ngot={got[:6]}\nwant={want[:6]}"
