"""Property-based tests (hypothesis) for the pure-python codec family:
lossless roundtrips over arbitrary inputs, and JPEG's constant-block
lossless subset — the invariants the q49/q70-q74 oracles lean on."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


settings.register_profile("codecs", max_examples=25, deadline=None)
settings.load_profile("codecs")


@given(arrays(np.uint8, st.tuples(st.integers(1, 24),
                                  st.integers(1, 24))))
def test_gif_roundtrip_any_matrix(m):
    from rainforest_spark.grid.gif import decode_gif_bytes, encode_gif_bytes

    got, _ = decode_gif_bytes(encode_gif_bytes(m))
    assert (got == m).all()


@given(arrays(np.uint8, st.tuples(st.integers(1, 5),
                                  st.integers(1, 16),
                                  st.integers(1, 16))))
def test_animated_gif_roundtrip_any_frames(stack):
    from rainforest_spark.grid.gif import (
        decode_gif_frames, encode_gif_frames,
    )

    frames = list(stack)
    got, _ = decode_gif_frames(encode_gif_frames(frames))
    assert len(got) == len(frames)
    assert all((a == b).all() for a, b in zip(got, frames))


@given(arrays(np.uint8, st.tuples(st.integers(1, 24),
                                  st.integers(1, 24))))
def test_png_grey_roundtrip_any_matrix(m):
    from rainforest_spark.grid.png import decode_png_bytes, encode_png_bytes

    assert (decode_png_bytes(encode_png_bytes(m)) == m).all()


@given(arrays(np.uint8, st.tuples(st.integers(1, 12),
                                  st.integers(1, 12),
                                  st.just(3))))
def test_png_rgb_collapse_any_matrix(px):
    from rainforest_spark.grid.png import decode_png_bytes, encode_png_bytes

    got = decode_png_bytes(encode_png_bytes(px))
    rgb = px.astype(np.int64)
    want = ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
             + rgb[:, :, 2] * 114) // 1000).astype(np.uint8)
    assert (got == want).all()


@given(arrays(np.int16, st.integers(1, 200)))
def test_wav_roundtrip_any_samples(s):
    from rainforest_spark.grid.wav import decode_wav_bytes, encode_wav_bytes

    arr, rate, ch = decode_wav_bytes(encode_wav_bytes(s))
    assert ch == 1 and (arr == s.astype(np.int32)).all()


@given(arrays(np.uint8, st.tuples(st.integers(1, 4),
                                  st.integers(1, 4))))
def test_jpeg_constant_blocks_lossless_at_q95(blocks):
    """The q72 oracle's premise as a property: ANY grid of 8×8-constant
    blocks round-trips JPEG q95 exactly (DC step 2 divides 8Δ)."""
    from rainforest_spark.grid.jpeg import (
        decode_jpeg_bytes, encode_jpeg_bytes,
    )

    img = np.kron(blocks, np.ones((8, 8), np.uint8))
    got = decode_jpeg_bytes(encode_jpeg_bytes(img, quality=95))
    assert (got == img).all()


@given(arrays(np.uint8, st.tuples(st.integers(8, 32),
                                  st.integers(8, 32))),
       st.integers(50, 95))
def test_jpeg_any_matrix_bounded_error(m, quality):
    """Lossy path stays sane on arbitrary input at any mid/high
    quality: shape preserved, error bounded (worst case: noise)."""
    from rainforest_spark.grid.jpeg import (
        decode_jpeg_bytes, encode_jpeg_bytes,
    )

    got = decode_jpeg_bytes(encode_jpeg_bytes(m, quality=quality))
    assert got.shape == m.shape
    err = np.abs(got.astype(int) - m.astype(int))
    assert err.mean() < 48   # noise at q50 stays far from garbage
