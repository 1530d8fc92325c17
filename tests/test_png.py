"""Pure-python PNG codec: roundtrip, all five filters, RGB collapse,
and the multimodal decode path picking it up without PIL."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rainforest_spark.grid.png import decode_png_bytes, encode_png_bytes


def _png_with_filters(px: np.ndarray, ctype: int, filters: list[int]) -> bytes:
    """Forward-filter ``px`` (h, w, ch) with a chosen filter per row and
    wrap it as a PNG — an independent re-derivation of the spec's
    FORWARD direction, so the decoder's inverse is tested against it."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        f = filters[r % len(filters)]
        row = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, np.int32)
        out = np.zeros(stride, np.int32)
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            out[i] = (row[i] - pred) & 0xFF
        raw += bytes([f]) + out.astype(np.uint8).tobytes()

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_grey_roundtrip_own_encoder():
    rng = np.random.RandomState(4)
    m = rng.randint(0, 256, (23, 31)).astype(np.uint8)
    assert (decode_png_bytes(encode_png_bytes(m)) == m).all()


def test_all_filters_invert():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (10, 9, 1)).astype(np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        buf = _png_with_filters(px, 0, filters)
        assert (decode_png_bytes(buf) == px[:, :, 0]).all(), filters


def test_rgb_collapses_itu601():
    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, (6, 7, 3)).astype(np.uint8)
    buf = _png_with_filters(px, 2, [0, 1, 4])
    got = decode_png_bytes(buf)
    rgb = px.astype(np.int64)
    want = ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
             + rgb[:, :, 2] * 114) // 1000).astype(np.uint8)
    assert (got == want).all()


def test_unsupported_depth_raises():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    buf = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
           + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_bytes(buf)


def test_multimodal_decodes_png_without_pil(spark):
    """decode_image produces real pixel stats for PNG content through
    the pure-python path (PIL not required)."""
    from rainforest_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(7)
    m = rng.randint(0, 256, (12, 8)).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(encode_png_bytes(m)), "cam")],
        "media_id bigint, kind string, content binary, source string")
    r = decode_image(df).collect()[0]
    assert r.format == "png" and r.decoded
    assert (r.width, r.height, r.n_px) == (8, 12, 96)
    assert abs(r.px_mean - m.mean()) < 1e-9
    assert (r.px_min, r.px_max) == (int(m.min()), int(m.max()))
