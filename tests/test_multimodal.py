"""Multimodal binary-column plumbing: header decode, feature stub,
frame-sampling plan."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest


def _png(w, h):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_data = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    ihdr = (struct.pack(">I", len(ihdr_data)) + b"IHDR" + ihdr_data
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data)))
    return sig + ihdr


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 10


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytearray(_png(640, 480)), "camA"),
        (1, "image", bytearray(_gif(32, 64)), "camB"),
        (2, "image", bytearray(b"\x00garbage\x01" * 10), "camC"),
        (3, "image", bytearray(np.arange(256, dtype=np.uint8).tobytes()), "camD"),
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary, source string")


def test_decode_image_meta(spark, media):
    from rainforest_spark.operators.multimodal import decode_image_meta

    out = {r.media_id: r for r in decode_image_meta(media).collect()}
    assert (out[0].format, out[0].width, out[0].height) == ("png", 640, 480)
    assert (out[1].format, out[1].width, out[1].height) == ("gif", 32, 64)
    assert out[2].format == "unknown" and out[2].width == -1
    assert out[0].n_bytes == len(_png(640, 480))


def test_extract_features_deterministic(spark, media):
    from rainforest_spark.operators.multimodal import extract_features

    a = {r.media_id: r.features for r in extract_features(media).collect()}
    b = {r.media_id: r.features for r in extract_features(media).collect()}
    assert a == b
    v = np.array(a[3])
    assert len(v) == 16 and abs(v.sum() - 1.0) < 1e-6
    assert np.allclose(v, 1.0 / 16, atol=1e-6)  # uniform bytes → flat hist


def test_frame_sample_plan(spark):
    from rainforest_spark.operators.multimodal import frame_sample_plan

    clips = spark.createDataFrame([(0, 95), (1, 5)],
                                  "clip_id bigint, n_frames int")
    out = frame_sample_plan(clips, every=10).collect()
    frames = sorted(r.frame_idx for r in out if r.clip_id == 0)
    assert frames == list(range(0, 95, 10))
    assert [r.frame_idx for r in out if r.clip_id == 1] == [0]
