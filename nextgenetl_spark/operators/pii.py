"""PII detection / redaction for training-data curation.

A 100-TB curation pipeline scrubs obvious machine-matchable PII (emails,
phone numbers, IP addresses, SSN-shaped ids) before training. All of this
is pure Column expression work — chained ``regexp_replace`` /
``regexp_count`` that stays inside whole-stage codegen at the scan stage;
no UDFs, no shuffle. The patterns deliberately use syntax valid in BOTH
Java regex (Spark) and RE2 (DuckDB) so every workload built on them is
oracle-checkable.

This is the regex tier only: model-based NER scrubbing would slot in as a
``mapInPandas`` stage downstream (same shape as operators/multimodal.py),
but is out of engine scope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: Pattern name → (regex, replacement token). Order matters: earlier
#: patterns must not produce text later ones would re-match.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
}


def pii_counts(col) -> list[F.Column]:
    """One ``<name>_hits`` LongType column per pattern (regexp_count —
    codegen, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(rx)).cast("long").alias(f"{name}_hits")
        for name, (rx, _) in PII_PATTERNS.items()
    ]


def redact(col, patterns: dict[str, tuple[str, str]] | None = None) -> F.Column:
    """Replace every PII match with its class token. Chained
    regexp_replace — one projection, evaluated left to right.

    Order note: ssn runs before phone in PII_PATTERNS iteration only if
    dict order says so; with the default patterns a 123-45-6789 SSN does
    not match the phone shape (3-3-4), so the chain is order-safe."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, (rx, token) in (patterns or PII_PATTERNS).items():
        c = F.regexp_replace(c, rx, token)
    return c


def scrub(df, text_col: str = "text", keep_counts: bool = True):
    """documents-shaped scrub: redacted text plus per-class hit counts and
    a ``has_pii`` flag (curation pipelines route on it: quarantine, drop,
    or keep-with-scrub)."""
    cols = [c for c in df.columns if c != text_col]
    out = [*cols, redact(text_col).alias(text_col)]
    if keep_counts:
        # counts run on the ORIGINAL column, in the same projection as the
        # redaction — one scan-stage pass
        out += pii_counts(text_col)
    df = df.select(*out)
    if keep_counts:
        hit_cols = [F.col(f"{n}_hits") for n in PII_PATTERNS]
        total = hit_cols[0]
        for h in hit_cols[1:]:
            total = total + h
        df = df.withColumn("has_pii", total > 0)
    return df
