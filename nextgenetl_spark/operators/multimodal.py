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


def attach_image_blob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 12,
    height: int = 8,
) -> DataFrame:
    """Materialize a REAL (decodable) image column: each row's text bytes,
    truncated/zero-padded to width×height×3, become the RGB samples of a
    binary PPM. Deterministic, so an oracle can recompute every decoded
    pixel from the text — which makes the full decode→thumbnail→hash path
    hash-verifiable, not just shape-checked."""
    import numpy as np

    need = width * height * 3

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = text.encode("utf-8")[:need]
                raw += b"\x00" * (need - len(raw))
                arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3)
                ids.append(doc_id)
                blobs.append(encode_ppm(arr))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "blob": blobs})

    return df.mapInPandas(
        render,
        T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
        ),
    )


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


# ---- executable image codec path ------------------------------------------
# A minimal pure-Python/numpy codec for the two uncompressed container
# formats a pipeline can synthesize deterministically: binary PPM ("P6") and
# 24-bit BI_RGB BMP ("BM"). PIL, when installed, transparently takes over
# for every other format (JPEG/PNG/…) — same mapInPandas plan either way,
# so the Spark-side plumbing (schema, batching, partitioning) is identical
# in this container and on a cluster with real codecs.


def _decode_ppm(b: bytes):
    """Binary PPM (P6, maxval 255) → (h, w, 3) uint8 array."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM blob")
    # header tokens: P6 <width> <height> <maxval>, '#' comments allowed
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"P6 maxval {maxval} unsupported (need 255)")
    need = w * h * 3
    arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape(h, w, 3)


def _decode_bmp(b: bytes):
    """Uncompressed 24-bit BI_RGB BMP (bottom-up, BGR, 4-byte row pad) →
    (h, w, 3) uint8 RGB array."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported (need 24/BI_RGB)")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flipped else rgb


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary PPM blob (the synthesis/re-encode
    format of the pure-Python path)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_blob_to_array(b: bytes):
    """One blob → (h, w, 3) uint8 RGB. PIL first (any format) when
    installed; pure-Python PPM/BMP decoders otherwise."""
    import numpy as np

    try:  # real-codec swap point: covers JPEG/PNG/… when pillow is present
        import PIL.Image
        import io

        return np.asarray(PIL.Image.open(io.BytesIO(bytes(b))).convert("RGB"))
    except ImportError:
        pass
    b = bytes(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    raise ValueError(f"unsupported image container (magic {b[:2]!r}); install pillow")


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),  # raw RGB, row-major
    ]
)


def decode_image(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Blob → decoded pixels, Arrow-batched: each batch decodes its blobs
    executor-side (bytes never visit the driver) and yields raw row-major
    RGB plus dimensions. Runs in THIS container via the pure PPM/BMP
    decoders; PIL swaps in transparently for compressed formats."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, px = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = decode_blob_to_array(blob)
                ids.append(doc_id)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                px.append(arr.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series([3] * len(ids), dtype="int32"),
                    "pixels": px,
                }
            )

    return df.mapInPandas(decode, DECODED_IMAGE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("blob", T.BinaryType())]
)


def _resize_nearest(arr, width: int, height: int):
    """Deterministic nearest-neighbor resample: src index = floor(i*src/dst)
    — integer arithmetic only, so a test (or another engine) can replay it
    bit-exactly."""
    import numpy as np

    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols]


def resize_image(
    df: DataFrame, width: int, height: int, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Blob in → resized blob out (PPM re-encode), same Arrow-batched plan
    shape as ``decode_image``. Nearest-neighbor keeps the path
    deterministic; a PIL Lanczos resample swaps into the same stage."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = decode_blob_to_array(blob)
                ids.append(doc_id)
                blobs.append(encode_ppm(_resize_nearest(arr, width, height)))
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "blob": blobs})

    return df.mapInPandas(resize, RESIZED_SCHEMA)


def perceptual_hash_pixels(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """DECODED-PIXEL perceptual hash (the real-codec twin of
    ``perceptual_hash``): decode → integer luma ((299r+587g+114b)//1000) →
    8×8 nearest-neighbor thumbnail → bit b set iff thumb pixel b > mean.
    Small pixel edits flip few bits; global recolor flips many. Feeds the
    same ``banded_hamming_pairs`` join as the histogram stub — only the
    fingerprint stage changes, the candidate-generation plan is untouched."""
    import numpy as np

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = decode_blob_to_array(blob).astype(np.int64)
                luma = (arr[:, :, 0] * 299 + arr[:, :, 1] * 587 + arr[:, :, 2] * 114) // 1000
                thumb = _resize_nearest(luma, 8, 8)
                total = int(thumb.sum())  # v > mean as v*64 > total: integer-exact
                fp = 0
                for bit, v in enumerate(thumb.ravel()):
                    if int(v) * 64 > total:
                        fp |= 1 << bit
                if fp >= 1 << 63:
                    fp -= 1 << 64
                ids.append(doc_id)
                fps.append(fp)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "fp": pd.Series(fps, dtype="int64")}
            )

    return df.mapInPandas(hash_batch, PHASH_SCHEMA)


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
