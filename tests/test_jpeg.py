"""Pure-python baseline JPEG codec: exact unit properties, lossy
reconstruction bounds, interleave/restart stream features, and the
multimodal decode path picking it up without PIL."""

from __future__ import annotations

import numpy as np
import pytest

from rainforest_spark.grid.jpeg import (
    AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, ZIGZAG, _A,
    build_huffman, decode_jpeg_bytes, encode_jpeg_bytes,
)


def test_dct_basis_orthonormal():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)
    x = np.random.RandomState(0).randn(8, 8)
    assert np.allclose(_A.T @ (_A @ x @ _A.T) @ _A, x, atol=1e-12)


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: zigzag walks 0, (0,1), (1,0), (2,0), (1,1), (0,2)
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_huffman_canonical_prefix_free():
    for bits, vals in ((DC_LUMA_BITS, DC_LUMA_VALS),
                       (AC_LUMA_BITS, AC_LUMA_VALS)):
        t = build_huffman(bits, vals)
        assert len(t) == sum(bits)
        # prefix-free: no code is a prefix of a longer code
        codes = {(ln, c) for (ln, c) in t}
        for ln, c in codes:
            for ln2, c2 in codes:
                if ln2 > ln:
                    assert (c2 >> (ln2 - ln)) != c or (ln, c) == (ln2, c2)


def test_constant_and_gradient_near_exact_at_q95():
    m = np.full((16, 24), 130, np.uint8)
    assert (decode_jpeg_bytes(encode_jpeg_bytes(m, 95)) == m).all()
    yy, xx = np.mgrid[0:32, 0:40]
    g = ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(g, 95))
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 2


def test_noise_bounded_error():
    rng = np.random.RandomState(1)
    m = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(m, 90))
    err = np.abs(d.astype(int) - m.astype(int))
    assert d.shape == m.shape
    assert err.mean() < 8 and err.max() < 40   # lossy, but sane


def test_interleaved_and_restart_streams_decode_identically():
    rng = np.random.RandomState(2)
    m = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    base = decode_jpeg_bytes(encode_jpeg_bytes(m, 90))
    for kwargs in ({"components": 3}, {"restart_interval": 2},
                   {"components": 3, "restart_interval": 3}):
        assert (decode_jpeg_bytes(encode_jpeg_bytes(m, 90, **kwargs))
                == base).all(), kwargs


def test_non_multiple_of_8_dims():
    rng = np.random.RandomState(3)
    m = rng.randint(0, 256, (13, 19)).astype(np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(m, 95))
    assert d.shape == (13, 19)


def test_progressive_rejected():
    buf = bytearray(encode_jpeg_bytes(np.zeros((8, 8), np.uint8)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2                       # flip SOF0 → SOF2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_bytes(bytes(buf))


def test_multimodal_decodes_jpeg_without_pil(spark):
    from rainforest_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(4)
    m = (rng.rand(16, 16) * 60 + 100).astype(np.uint8)   # low contrast
    df = spark.createDataFrame(
        [(0, "image", bytearray(encode_jpeg_bytes(m, 95, components=3)),
          "cam")],
        "media_id bigint, kind string, content binary, source string")
    r = decode_image(df).collect()[0]
    assert r.format == "jpeg" and r.decoded
    assert (r.width, r.height, r.n_px) == (16, 16, 256)
    assert abs(r.px_mean - m.mean()) < 3.0   # lossy tolerance


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a single-component scan is non-interleaved (raster
    block order, h=v=1) REGARDLESS of declared sampling factors.  A
    foreign grey JPEG declaring 2x2 sampling must decode identically to
    the 1x1 stream — before the fix this mis-walked in 16x16 MCU order
    (usually a caught Huffman error, occasionally wrong pixels)."""
    rng = np.random.RandomState(7)
    m = (rng.rand(24, 16) * 255).astype(np.uint8)
    buf = bytearray(encode_jpeg_bytes(m, quality=95))
    sof = bytes(buf).find(b"\xff\xc0")
    assert sof >= 0 and buf[sof + 9] == 1      # one component
    assert buf[sof + 11] == 0x11               # encoder writes 1x1
    buf[sof + 11] = 0x22                       # declare 2x2 sampling
    got = decode_jpeg_bytes(bytes(buf))
    want = decode_jpeg_bytes(encode_jpeg_bytes(m, quality=95))
    np.testing.assert_array_equal(got, want)
