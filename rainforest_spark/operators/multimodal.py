"""Multimodal (image/audio/video) columns for training-data pipelines.

Design: media is an opaque ``binary`` column with typed metadata columns
beside it — the Spark-native pattern for 100 TB multimodal sets (bytes
stay columnar, metadata prunes/filters push down, partitioning is by
metadata not by blob).  Decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` so bytes cross to Python once per
batch, not per row.

Decode is REAL for GIF, PNG and baseline JPEG (the repo's pure-python
codecs — grid/gif.py, grid/png.py, grid/jpeg.py — mirroring the
reference's raster archive path, io_data.py:262-292); PIL remains an
import-gated fallback for the exotic JPEG variants (progressive,
12-bit).  ``decode_image`` emits
per-file scalar pixel statistics from actually-decoded planes;
``resize_images`` nearest-neighbour-resamples the decoded plane and
re-encodes it (GIF87a bytes out).  ``extract_features`` keeps the
byte-histogram signature for arbitrary blobs (it stands in for a model
forward pass — weights aren't data-derivable in any engine);
``pixel_histogram_features`` is its decoded-plane counterpart.  The
Spark-side plumbing — schema, batching, partition behaviour — is the
same either way: bytes cross to Python once per Arrow batch.
"""

from __future__ import annotations

import itertools
import struct
from collections.abc import Iterator
from zlib import error as zlib_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, content binary, "
                "source string")


def _parse_image_header(b: bytes) -> tuple[str, int, int]:
    """Pure-python PNG/JPEG/GIF header parse; ('unknown', -1, -1) otherwise."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:3] == b"GIF" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments for SOF0/2
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seg_len
    return "unknown", -1, -1


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Arrow-batched header decode → (format, width, height, n_bytes).

    A real pipeline swaps ``_parse_image_header`` for PIL decode; the
    mapInPandas shape (schema, batching) is what matters at scale.
    """
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    # StructType.add mutates in place — always build a fresh copy, never
    # extend df.schema directly.
    out_schema = StructType(list(df.schema.fields) + [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_parse_image_header(b or b"") for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["format"] = [m[0] for m in meta]
            pdf["width"] = np.int32([m[1] for m in meta])
            pdf["height"] = np.int32([m[2] for m in meta])
            pdf["n_bytes"] = [len(b or b"") for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, content_col: str = "content",
                     dim: int = 16) -> DataFrame:
    """Deterministic byte-histogram 'embedding' (stub for a model pass).

    Real deployments broadcast model weights and run the forward pass here
    — the Arrow batch boundary and output schema are identical.
    """
    from pyspark.sql.types import (
        ArrayType, FloatType, StructField, StructType,
    )

    out_schema = StructType(list(df.schema.fields)
                            + [StructField("features",
                                           ArrayType(FloatType()))])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[content_col]:
                arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


#: what a malformed/truncated blob can raise out of the pure-python
#: codecs: parse errors (ValueError), short reads hitting struct
#: (struct.error) or slicing (IndexError), zlib streams (zlib.error),
#: and Huffman table lookups (KeyError)
_DECODE_ERRORS = (ValueError, struct.error, IndexError, KeyError,
                  zlib_error)


def _decode_plane(b: bytes) -> tuple[str, int, int, "np.ndarray | None"]:
    """Decode a blob to a 2-D uint8 luminance plane.

    GIF, PNG and baseline JPEG decode with the repo's pure-python
    codecs (GIF palette index IS luminance for the grayscale palettes
    the DN sinks write; PNG RGB collapses via integer ITU-601; JPEG
    returns the Y plane).  PIL, when importable, catches the exotic
    remainder (progressive JPEG etc.).  Malformed blobs NEVER raise —
    one corrupt file must not fail a corpus-wide task.  Returns
    (format, header_width, header_height, plane or None)."""
    fmt, w, h = _parse_image_header(b)
    if fmt == "gif":
        # indices map THROUGH the frame's palette (local-or-global;
        # ITU-601 collapse — identity for the grayscale ramp the DN
        # encoders write, correct for foreign color/non-identity
        # palettes, None when no palette declares the values)
        from rainforest_spark.grid.gif import (
            decode_gif_frames_with_palettes, index_to_luminance,
        )

        try:
            frames, pals = decode_gif_frames_with_palettes(b, max_frames=1)
            return fmt, w, h, index_to_luminance(frames[0], pals[0])
        except _DECODE_ERRORS:
            return fmt, w, h, None
    if fmt == "png":
        # pure-python first (grid/png.py — always present, and its
        # ITU-601 grey collapse matches PIL's convert('L'))
        from rainforest_spark.grid.png import decode_png_bytes

        try:
            return fmt, w, h, decode_png_bytes(b)
        except _DECODE_ERRORS:
            pass  # unsupported subset → PIL below if available
    if fmt == "jpeg":
        # pure-python baseline decoder first (grid/jpeg.py, Y plane —
        # the luminance-first convention PIL's convert('L') follows)
        from rainforest_spark.grid.jpeg import decode_jpeg_bytes

        try:
            return fmt, w, h, decode_jpeg_bytes(b)
        except _DECODE_ERRORS:
            pass  # progressive/12-bit/etc → PIL below if available
    if fmt in ("png", "jpeg"):
        try:
            import io

            from PIL import Image
        except ImportError:
            return fmt, w, h, None
        try:
            img = Image.open(io.BytesIO(b)).convert("L")
            return fmt, w, h, np.asarray(img, dtype=np.uint8)
        except Exception:
            return fmt, w, h, None
    return fmt, w, h, None


def _plane_stats(plane: "np.ndarray | None") -> tuple:
    """(n_px, mean, std, min, max) with EXACT integer sums then a fixed
    double expression order, so an engine computing
    ``s2/n - (s/n)**2`` from the same bytes reproduces the doubles
    bit-for-bit (the q49 oracle does exactly that in SQL)."""
    if plane is None or plane.size == 0:
        return 0, None, None, None, None
    flat = plane.astype(np.int64).ravel()
    n = int(flat.size)
    s = int(flat.sum())
    s2 = int((flat * flat).sum())
    mean = s / n
    var = s2 / n - mean * mean
    return (n, mean, float(np.sqrt(max(var, 0.0))),
            int(flat.min()), int(flat.max()))


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL decode → per-file scalar pixel statistics.

    Adds: format, width, height (header), decoded (bool), n_px,
    px_mean, px_std, px_min, px_max (from the decoded plane; null when
    the format isn't decodable in this environment).  Scalar outputs
    keep the whole result value-hashable — no array cells."""
    from pyspark.sql.types import (
        BooleanType, DoubleType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    out_schema = StructType(list(df.schema.fields) + [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("decoded", BooleanType()),
        # LongType to match sample_frames/decode_audio (sibling stat
        # schemas) and survive planes >= 2^31 pixels
        StructField("n_px", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_std", DoubleType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b in pdf[content_col]:
                fmt, w, h, plane = _decode_plane(bytes(b or b""))
                n, mean, std, mn, mx = _plane_stats(plane)
                rows.append((fmt, w, h, plane is not None, n, mean, std,
                             mn, mx))
            pdf = pdf.copy()
            cols = (map(list, zip(*rows)) if rows
                    else ([] for _ in range(9)))
            (pdf["format"], pdf["width"], pdf["height"], pdf["decoded"],
             pdf["n_px"], pdf["px_mean"], pdf["px_std"], pdf["px_min"],
             pdf["px_max"]) = cols
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def pixel_histogram_features(df: DataFrame, content_col: str = "content",
                             dim: int = 16) -> DataFrame:
    """Normalized histogram over the DECODED pixel plane (the real-pixel
    counterpart of ``extract_features``; null for undecodable blobs)."""
    from pyspark.sql.types import (
        ArrayType, FloatType, StructField, StructType,
    )

    out_schema = StructType(list(df.schema.fields)
                            + [StructField("features",
                                           ArrayType(FloatType()))])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[content_col]:
                plane = _decode_plane(bytes(b or b""))[3]
                if plane is None:
                    feats.append(None)
                    continue
                hist, _ = np.histogram(plane.ravel(), bins=dim,
                                       range=(0, 256))
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content",
                  out_col: str = "resized") -> DataFrame:
    """REAL resize: decode → nearest-neighbour resample (the classic
    index-map ``plane[floor(r*H/h'), floor(c*W/w')]``) → re-encode as
    GIF87a bytes.  Undecodable blobs yield null.  Runs fully
    executor-side per Arrow batch; output stays an opaque binary column
    beside its metadata, like the input."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from rainforest_spark.grid.gif import encode_gif_bytes

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, BinaryType())])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf[content_col]:
                plane = _decode_plane(bytes(b or b""))[3]
                if plane is None:
                    out.append(None)
                    continue
                h, w = plane.shape
                rr = (np.arange(height) * h) // height
                cc = (np.arange(width) * w) // width
                out.append(encode_gif_bytes(plane[np.ix_(rr, cc)]))
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL audio decode (WAV/RIFF PCM, grid/wav.py) → per-file scalar
    waveform statistics: sample_rate, n_channels, n_samples, amp_mean,
    amp_rms (sqrt of the exact integer power sum / n), amp_min,
    amp_max.  Null stats for non-WAV blobs.  Same Arrow-batched shape
    as ``decode_image`` — scalar outputs keep results value-hashable."""
    from pyspark.sql.types import (
        BooleanType, DoubleType, IntegerType, LongType, StructField,
        StructType,
    )

    from rainforest_spark.grid.wav import decode_wav_bytes

    out_schema = StructType(list(df.schema.fields) + [
        StructField("decoded", BooleanType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("amp_mean", DoubleType()),
        StructField("amp_rms", DoubleType()),
        StructField("amp_min", IntegerType()),
        StructField("amp_max", IntegerType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b in pdf[content_col]:
                b = bytes(b or b"")
                try:
                    arr, rate, ch = decode_wav_bytes(b)
                except (ValueError, struct.error):
                    rows.append((False, None, None, None, None, None,
                                 None, None))
                    continue
                n = int(arr.size)
                if n == 0:
                    rows.append((True, rate, ch, 0, None, None, None,
                                 None))
                    continue
                flat = arr.astype(np.int64)
                s = int(flat.sum())
                s2 = int((flat * flat).sum())
                rows.append((True, rate, ch, n, s / n,
                             float(np.sqrt(s2 / n)),
                             int(flat.min()), int(flat.max())))
            pdf = pdf.copy()
            cols = (map(list, zip(*rows)) if rows
                    else ([] for _ in range(8)))
            (pdf["decoded"], pdf["sample_rate"], pdf["n_channels"],
             pdf["n_samples"], pdf["amp_mean"], pdf["amp_rms"],
             pdf["amp_min"], pdf["amp_max"]) = cols
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, content_col: str = "content",
                  every: int = 2) -> DataFrame:
    """REAL video-style frame extraction: decode an animated (multi-
    image) GIF stream and emit one row per SAMPLED frame (every
    ``every``-th, starting at 0) with scalar pixel stats — the decode
    step ``frame_sample_plan`` plans for, actually executed.

    Fan-out happens executor-side inside the Arrow batch (one input row
    → one row per sampled frame); undecodable blobs contribute no rows.
    """
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    from rainforest_spark.grid.gif import (
        decode_gif_frames_with_palettes, index_to_luminance,
    )

    key_fields = [f for f in df.schema.fields if f.name != content_col]
    out_schema = StructType(key_fields + [
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_px", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_std", DoubleType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ])
    key_names = [f.name for f in key_fields]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            # plain zip over the key columns + content — no pandas
            # row-boxing (iterrows builds a Series per row)
            keys = (zip(*[pdf[k] for k in key_names]) if key_names
                    else itertools.repeat(()))
            for key, b in zip(keys, pdf[content_col]):
                try:
                    frames, pals = decode_gif_frames_with_palettes(
                        bytes(b or b""))
                except _DECODE_ERRORS:
                    continue
                for idx in range(0, len(frames), every):
                    plane = index_to_luminance(frames[idx], pals[idx])
                    if plane is None:   # no palette declares the values
                        continue
                    n, mean, std, mn, mx = _plane_stats(plane)
                    rows.append(key + (idx, len(frames), n, mean, std,
                                       mn, mx))
            yield pd.DataFrame(rows, columns=key_names + [
                "frame_idx", "n_frames", "n_px", "px_mean", "px_std",
                "px_min", "px_max"])

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, n_frames_col: str = "n_frames",
                      every: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-index plan per clip
    (decode itself would run in a later mapInPandas).  Pure column ops —
    the plan fan-out happens executor-side."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                     F.lit(every))
    return df.withColumn("frame_idx", F.explode(idx))




def _phash64(plane: "np.ndarray") -> int:
    """64-bit perceptual hash of a uint8 luminance plane (the classic
    pHash recipe): nearest-neighbour resample to 32x32, orthonormal
    2-D DCT-II, take the 8x8 low-frequency block, threshold each
    coefficient against the median of the 63 AC coefficients.  Pure
    numpy (two 32x32 matmuls) — deterministic, no image library."""
    h, w = plane.shape
    rr = (np.arange(32) * h) // 32
    cc = (np.arange(32) * w) // 32
    x = plane[np.ix_(rr, cc)].astype(np.float64)
    n = 32
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) \
        * np.sqrt(2.0 / n)
    basis[0, :] = np.sqrt(1.0 / n)
    d = basis @ x @ basis.T
    low = d[:8, :8].ravel()
    med = float(np.median(low[1:]))
    bits = low > med
    v = 0
    for b in range(64):
        if bits[b]:
            v |= (1 << b)
    if v >= (1 << 63):           # two's-complement into a SQL BIGINT
        v -= (1 << 64)
    return v


def image_phash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """REAL perceptual hashing: decode (the q49 codec stack) → pHash.

    Adds ``phash`` (64-bit BIGINT, null when undecodable) and
    ``decoded``.  The hash is resolution-invariant by construction
    (everything resamples to 32x32) and robust to re-encoding: the
    SAME pixels shipped as GIF and PNG hash identically, and small
    pixel edits flip few bits — which is exactly what the banded
    Hamming join needs.

    Shape at 100 TB: one zero-Exchange Arrow mapInPandas stage over
    the binary scan, like decode_image.
    """
    from pyspark.sql.types import (
        BooleanType, LongType, StructField, StructType,
    )

    out_schema = StructType(list(df.schema.fields) + [
        StructField("decoded", BooleanType()),
        StructField("phash", LongType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dec, ph = [], []
            for b in pdf[content_col]:
                plane = _decode_plane(bytes(b or b""))[3]
                if plane is None or plane.size == 0:
                    dec.append(False)
                    ph.append(None)
                else:
                    dec.append(True)
                    ph.append(_phash64(plane))
            pdf = pdf.copy()
            pdf["decoded"], pdf["phash"] = dec, ph
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def phash_neardup_pairs(df: DataFrame, id_col: str,
                        content_col: str = "content",
                        max_hamming: int = 7,
                        n_bands: int | None = None) -> DataFrame:
    """Image near-duplicate pairs: pHash signatures through the SAME
    banded Hamming join as SimHash text dedup
    (operators/dedup.hamming_neardup_pairs) — re-encoded, resized and
    lightly-edited copies of an image pair up; unrelated images don't.
    Undecodable blobs drop out before banding (a null signature can
    never pair)."""
    from rainforest_spark.operators.dedup import hamming_neardup_pairs

    sig = (image_phash(df, content_col)
           .filter(F.col("phash").isNotNull())
           .select(F.col(id_col), "phash"))
    return hamming_neardup_pairs(sig, id_col, "phash",
                                 max_hamming=max_hamming,
                                 n_bands=n_bands)


def _audio_fp64(arr: "np.ndarray", n_windows: int = 65) -> "int | None":
    """64-bit audio fingerprint: the energy CONTOUR of the (channel-
    summed) waveform — bit b is 1 iff window b+1 carries more energy
    than window b.  Window energies are EXACT integer sums of sample
    squares over equal-count slices, so the fingerprint is bit-stable
    across engines and padding-free re-encodes; tempo-preserving noise
    flips few bits.  None when the clip is shorter than the contour."""
    flat = arr.astype(np.int64)
    if flat.ndim > 1:
        flat = flat.sum(axis=1)
    n = flat.size
    if n < n_windows:
        return None
    bounds = (np.arange(n_windows + 1) * n) // n_windows
    sq = np.concatenate([[0], np.cumsum(flat * flat)])
    e = sq[bounds[1:]] - sq[bounds[:-1]]
    v = 0
    for b in range(n_windows - 1):
        if e[b + 1] > e[b]:
            v |= (1 << b)
    if v >= (1 << 63):
        v -= (1 << 64)
    return v


def audio_fingerprint(df: DataFrame, content_col: str = "content",
                      n_windows: int = 65) -> DataFrame:
    """REAL audio fingerprinting: WAV decode (grid/wav.py) → windowed
    energy contour → 64-bit fingerprint (``n_windows`` = 65 gives 64
    comparison bits).  Null for non-WAV/too-short clips.  Same
    zero-Exchange Arrow mapInPandas shape as the other decoders."""
    from pyspark.sql.types import (
        BooleanType, LongType, StructField, StructType,
    )

    from rainforest_spark.grid.wav import decode_wav_bytes

    out_schema = StructType(list(df.schema.fields) + [
        StructField("decoded", BooleanType()),
        StructField("audio_fp", LongType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dec, fp = [], []
            for b in pdf[content_col]:
                try:
                    arr, _, _ = decode_wav_bytes(bytes(b or b""))
                    v = _audio_fp64(arr, n_windows)
                    dec.append(True)
                    fp.append(v)
                except _DECODE_ERRORS:
                    dec.append(False)
                    fp.append(None)
            pdf = pdf.copy()
            pdf["decoded"], pdf["audio_fp"] = dec, fp
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def audio_neardup_pairs(df: DataFrame, id_col: str,
                        content_col: str = "content",
                        max_hamming: int = 7,
                        n_bands: int | None = None) -> DataFrame:
    """Audio near-duplicate pairs: energy-contour fingerprints through
    the SAME banded Hamming join as text SimHash and image pHash
    (dedup.hamming_neardup_pairs) — the third leg of the multimodal
    dedup family.  Undecodable/short clips drop out before banding."""
    from rainforest_spark.operators.dedup import hamming_neardup_pairs

    sig = (audio_fingerprint(df, content_col)
           .filter(F.col("audio_fp").isNotNull())
           .select(F.col(id_col), "audio_fp"))
    return hamming_neardup_pairs(sig, id_col, "audio_fp",
                                 max_hamming=max_hamming,
                                 n_bands=n_bands)
