"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

A 100-TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature-extract
/ frame-sample as Arrow-batched Python stages (``mapInPandas``) because the
codecs live in Python. The real codecs (PIL, librosa, av) are NOT in this
container, so the decode step is stubbed: ``decode_media_features`` computes
deterministic features from the raw bytes (so the whole pipeline is testable
end-to-end), while ``decode_image`` shows the real-codec integration point
and raises ``NotImplementedError`` until a codec is installed.

Scale notes: mapInPandas streams Arrow record batches — the blob column
never materializes on the driver, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Schemas are declared
up-front so downstream plans are fully typed.

Reference: the closest analogue is NextGenETL's raw-file pull+transform
stages (common_etl/support.py:661-753 threaded bucket pulls feeding
per-file Python transforms); there is no binary-column support in the
reference — this module is part of the beyond-reference extension surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob_len", T.IntegerType()),
        T.StructField("header_hex", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the text
    stand in for media bytes — same column type and plan shape as real
    media)."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("blob"))


def decode_media_features(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched 'decode' producing typed metadata per blob.

    Deterministic fake decode: dimensions derive from the byte length, the
    header is the first 4 bytes hex — stable across engines so an oracle can
    verify the plumbing. Swap the body for a real codec without touching the
    plan: schema, batching, and partitioning stay identical.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            lens = blobs.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob_len": lens.astype("int32"),
                    "header_hex": blobs.map(lambda b: bytes(b[:4]).hex()),
                    "fake_width": (lens % 64 + 1).astype("int32"),
                    "fake_height": (lens // 64 % 64 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int32"),
                }
            )

    return df.mapInPandas(decode, MEDIA_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 5, bytes_per_frame: int = 100, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """1→N frame-sampling stage: each blob 'contains' ``blob_len //
    bytes_per_frame`` frames; emit every ``every_n``-th frame index. Shows the
    row-expanding mapInPandas shape a video pipeline uses (one input row →
    many frame rows), still Arrow-batched."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n_frames = len(blob) // bytes_per_frame
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                }
            )

    return df.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("start_byte", T.IntegerType()),
        T.StructField("end_byte", T.IntegerType()),
        T.StructField("n_windows", T.IntegerType()),
    ]
)


def audio_windows(
    df: DataFrame,
    window_bytes: int = 160,
    hop_bytes: int = 80,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size windows over a media blob — the ASR-training
    chunking shape (window/hop in bytes standing in for samples; a real
    pipeline derives them from the sample rate in the typed metadata).
    1→N row expansion via Arrow-batched mapInPandas, like ``sample_frames``
    but with hop < window overlap: a window starts at every hop offset
    while any byte remains, and the final partial window is kept (padded
    downstream), matching common feature-frame conventions."""

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, totals = [], [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                n = len(blob)
                starts_list = list(range(0, n, hop_bytes))
                n_win = len(starts_list)
                for i, s in enumerate(starts_list):
                    ids.append(doc_id)
                    idxs.append(i)
                    starts.append(s)
                    ends.append(min(s + window_bytes, n))
                    totals.append(n_win)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "start_byte": pd.Series(starts, dtype="int32"),
                    "end_byte": pd.Series(ends, dtype="int32"),
                    "n_windows": pd.Series(totals, dtype="int32"),
                }
            )

    return df.mapInPandas(windows, AUDIO_WINDOW_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("f0", T.DoubleType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("f2", T.DoubleType()),
        T.StructField("f3", T.DoubleType()),
    ]
)


def extract_features(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction per blob — the stage that turns
    media bytes into an embedding for the similarity/ANN pipeline
    (operators/similarity.py). Deterministic stub features (arithmetic on
    blob length + first-4-byte values, so an oracle can recompute them);
    a real model (CLIP et al.) swaps in without touching the plan — same
    mapInPandas shape, wider output schema."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            lens = blobs.map(len)
            b = [blobs.map(lambda x, i=i: x[i] if len(x) > i else 0) for i in range(4)]
            seed = lens * 31 + b[0] * 7 + b[1] * 13 + b[2] * 17 + b[3] * 19
            out = {"doc_id": pdf[id_col]}
            for i in range(4):
                out[f"f{i}"] = ((seed * (i + 1)) % 10007 / 10007.0).round(4)
            yield pd.DataFrame(out)

    return df.mapInPandas(feats, FEATURE_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int, blob_col: str = "blob") -> DataFrame:
    """Real-codec resize integration point (same mapInPandas shape as
    ``decode_image``: blob in → resized blob out, schema declared up-front).
    Requires an image library that is not installed in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "image resize requires PIL; install pillow and implement "
            "Image.open(bytes).resize((width, height)) inside a mapInPandas "
            "stage yielding (doc_id, blob) batches"
        ) from exc
    raise NotImplementedError("wire PIL resize over the blob bytes here")


def decode_image(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Real-codec integration point. Requires an image library (PIL) that is
    not installed in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec not in container
        raise NotImplementedError(
            "image decode requires PIL; install pillow and replace the stub body "
            "(same mapInPandas shape as decode_media_features)"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open over the blob bytes here")


PHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("fp", T.LongType())]
)


def perceptual_hash(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 64-bit 'perceptual hash' per media blob: bit b is the
    parity of the count of byte value 59+b (covering the lowercase/digit
    range of the stub blobs). Content-histogram bits are what makes it
    *perceptual*-shaped: a small edit (a re-encode header tweak, an
    appended byte) flips at most a few bits, while reordering flips none —
    unlike position-striped hashes, which scramble under any shift. A real
    pHash (DCT over decoded pixels) swaps into the same Arrow-batched stage
    without touching the plan or the downstream banded join; the stub keeps
    the path engine-replayable so the oracle verifies it end to end."""
    import numpy as np

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_fps = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                counts = np.bincount(
                    np.frombuffer(bytes(blob), dtype=np.uint8), minlength=123
                )
                fp = 0
                for bit in range(64):
                    if counts[59 + bit] & 1:
                        fp |= 1 << bit
                if fp >= 1 << 63:
                    fp -= 1 << 64
                out_ids.append(doc_id)
                out_fps.append(fp)
            yield pd.DataFrame(
                {"doc_id": pd.Series(out_ids, dtype="int64"), "fp": pd.Series(out_fps, dtype="int64")}
            )

    return df.mapInPandas(hash_batch, PHASH_SCHEMA)
