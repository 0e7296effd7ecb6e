"""Streaming NEAR-duplicate detection against a historical corpus.

``stream_history_antijoin`` (streaming/joins.py) is exact dedup-on-ingest;
this is its fuzzy sibling: each arriving document is MinHash-banded and
probed against a static banded signature index of the already-ingested
corpus, candidates verified by exact shingle-set Jaccard — all STATELESS
stream-static work (projections, explode, two joins), so append mode needs
no watermark and NO state store grows with the stream.

Two shapes make that possible:
- the per-row signature (``minhash_signature_expr``) is a Column HOF with
  identical hash math to the batch ``minhash_signatures`` — aggregation is
  illegal in append-mode streams, per-row expressions are not;
- multi-band matches of the same (new, hist) pair are collapsed WITHOUT
  ``dropDuplicates`` (which is stateful on streams, keeping every key
  forever): a pair is emitted only from its FIRST matching band, decided
  in-row by re-testing earlier bands' hashes against the carried history
  signature — the exact join criterion, so exactly one band row survives.

At 100 TB: the history index (id, band, bh) is written bucketed by
(band, bh) so the per-micro-batch probe is a bucket-local join; refreshing
the index needs no query restart (stream-static joins re-read the static
side each micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nextgenetl_spark.operators.dedup import (
    band_structs,
    jaccard,
    minhash_signature_expr,
    shingles,
)


def history_index(
    hist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Static-side index: (hist_id, band, bh) banded signatures, plus the
    verification table (hist_id, hist_sh shingle hashes, hist_sig full
    signature — carried so the stream side can re-test earlier bands).
    Built once (batch), re-read per micro-batch."""
    sigs = hist.select(
        F.col(id_col).alias("hist_id"),
        minhash_signature_expr(text_col, num_perm, shingle_n).alias("hist_sig"),
        F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s)).alias("hist_sh"),
    )
    bands = sigs.select(
        "hist_id", F.explode(band_structs("hist_sig", num_bands)).alias("b")
    ).select("hist_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    return bands, sigs.select("hist_id", "hist_sh", "hist_sig")


def _band_hash(sig_col, band, rows_per_band) -> F.Column:
    # must mirror band_structs exactly: xxhash64 over (slice, band-index)
    return F.xxhash64(F.slice(sig_col, band * rows_per_band + 1, rows_per_band), band)


def near_dup_against_history(
    stream_docs: DataFrame,
    hist_bands: DataFrame,
    hist_verify: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(new_id, hist_id, jac) for every arriving document whose shingle-set
    Jaccard with an already-ingested document reaches the threshold."""
    rows_per_band = num_perm // num_bands
    enriched = stream_docs.select(
        F.col(id_col).alias("new_id"),
        minhash_signature_expr(text_col, num_perm, shingle_n).alias("sig"),
        F.transform(shingles(text_col, shingle_n), lambda s: F.xxhash64(s)).alias("new_sh"),
    )
    probes = enriched.select(
        "new_id", "new_sh", "sig", F.explode(band_structs("sig", num_bands)).alias("b")
    ).select("new_id", "new_sh", "sig", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    cands = probes.join(hist_bands, ["band", "bh"]).join(hist_verify, "hist_id")
    # first-matching-band filter: drop this row if any EARLIER band also
    # hash-matches (that row emits the pair instead) — stateless pair dedup
    earlier = F.when(F.col("band") == 0, F.lit(False)).otherwise(
        F.exists(
            F.sequence(F.lit(0), F.col("band") - 1),
            lambda b2: _band_hash(F.col("sig"), b2, rows_per_band)
            == _band_hash(F.col("hist_sig"), b2, rows_per_band),
        )
    )
    return (
        cands.filter(~earlier)
        .select(
            "new_id",
            "hist_id",
            F.round(jaccard(F.col("new_sh"), F.col("hist_sh")), 4).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )
