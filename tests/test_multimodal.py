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


def test_decode_image_real_gif_stats(spark):
    """decode_image actually LZW-decodes GIF bytes: stats equal the
    source plane's, computed independently here with numpy."""
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import decode_image

    planes = {0: (np.arange(64).reshape(8, 8) * 4 % 251).astype(np.uint8),
              1: np.full((5, 7), 200, np.uint8),
              2: np.frombuffer(b"rainforest-spark" * 4,
                               dtype=np.uint8).reshape(8, 8)}
    rows = [(k, "image", bytearray(encode_gif_bytes(v)), "cam")
            for k, v in planes.items()]
    rows.append((9, "image", bytearray(b"\x00junk" * 8), "cam"))
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary, source string")
    out = {r.media_id: r for r in decode_image(df).collect()}
    for k, v in planes.items():
        r = out[k]
        assert r.decoded and r.format == "gif"
        assert (r.height, r.width) == v.shape
        assert r.n_px == v.size
        assert abs(r.px_mean - v.mean()) < 1e-9
        assert abs(r.px_std - v.std()) < 1e-9
        assert (r.px_min, r.px_max) == (int(v.min()), int(v.max()))
    assert out[9].decoded is False and out[9].px_mean is None


def test_resize_images_nearest_neighbour(spark):
    """resize_images resamples the decoded plane with the index map
    floor(r*H/h') and re-encodes losslessly."""
    from rainforest_spark.grid.gif import decode_gif_bytes, encode_gif_bytes
    from rainforest_spark.operators.multimodal import resize_images

    src = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(encode_gif_bytes(src)), "cam"),
         (1, "image", bytearray(b"notanimage"), "cam")],
        "media_id bigint, kind string, content binary, source string")
    out = {r.media_id: r.resized
           for r in resize_images(df, 4, 4).collect()}
    got, _ = decode_gif_bytes(bytes(out[0]))
    rr = (np.arange(4) * 8) // 4
    expected = src[np.ix_(rr, rr)]
    assert (got == expected).all()
    assert out[1] is None


def test_pixel_histogram_features(spark):
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import (
        pixel_histogram_features,
    )

    plane = np.zeros((8, 8), np.uint8)
    plane[:4] = 255
    df = spark.createDataFrame(
        [(0, "image", bytearray(encode_gif_bytes(plane)), "cam")],
        "media_id bigint, kind string, content binary, source string")
    feats = pixel_histogram_features(df, dim=16).collect()[0].features
    assert len(feats) == 16
    assert abs(feats[0] - 0.5) < 1e-6 and abs(feats[15] - 0.5) < 1e-6
    assert all(abs(f) < 1e-9 for f in feats[1:15])


def test_frame_sample_plan(spark):
    from rainforest_spark.operators.multimodal import frame_sample_plan

    clips = spark.createDataFrame([(0, 95), (1, 5)],
                                  "clip_id bigint, n_frames int")
    out = frame_sample_plan(clips, every=10).collect()
    frames = sorted(r.frame_idx for r in out if r.clip_id == 0)
    assert frames == list(range(0, 95, 10))
    assert [r.frame_idx for r in out if r.clip_id == 1] == [0]


def test_decode_audio_wav_stats(spark):
    """decode_audio parses real RIFF/WAV PCM and reproduces numpy's
    stats; non-WAV blobs yield null stats."""
    from rainforest_spark.grid.wav import encode_wav_bytes
    from rainforest_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(21)
    s = rng.randint(-2000, 2000, 64).astype(np.int16)
    df = spark.createDataFrame(
        [(0, "audio", bytearray(encode_wav_bytes(s, 8000)), "mic"),
         (1, "audio", bytearray(b"not audio"), "mic")],
        "media_id bigint, kind string, content binary, source string")
    out = {r.media_id: r for r in decode_audio(df).collect()}
    r = out[0]
    assert r.decoded and (r.sample_rate, r.n_channels) == (8000, 1)
    assert r.n_samples == 64
    assert abs(r.amp_mean - s.astype(np.int64).mean()) < 1e-9
    assert abs(r.amp_rms
               - np.sqrt((s.astype(np.int64) ** 2).mean())) < 1e-9
    assert (r.amp_min, r.amp_max) == (int(s.min()), int(s.max()))
    assert out[1].decoded is False and out[1].amp_mean is None


def test_wav_stereo_and_8bit():
    from rainforest_spark.grid.wav import decode_wav_bytes

    import struct as st

    # hand-build a stereo 16-bit WAV: channel0 = [100, -5], channel1 junk
    pcm = np.array([100, 7, -5, 9], dtype="<i2").tobytes()
    fmt = st.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    buf = (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
           + b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
           + b"data" + st.pack("<I", len(pcm)) + pcm)
    arr, rate, ch = decode_wav_bytes(buf)
    assert ch == 2 and arr.tolist() == [100, -5]
    # 8-bit unsigned recentres to signed
    pcm8 = bytes([128, 0, 255])
    fmt8 = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    buf8 = (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt8) + 8 + len(pcm8))
            + b"WAVE" + b"fmt " + st.pack("<I", len(fmt8)) + fmt8
            + b"data" + st.pack("<I", len(pcm8)) + pcm8)
    arr8, _, _ = decode_wav_bytes(buf8)
    assert arr8.tolist() == [0, -128, 127]


def test_sample_frames_animated_gif(spark):
    """sample_frames decodes a real multi-image GIF stream and emits
    one row per sampled frame with correct per-frame stats."""
    from rainforest_spark.grid.gif import encode_gif_frames
    from rainforest_spark.operators.multimodal import sample_frames

    rng = np.random.RandomState(22)
    frames = [rng.randint(0, 256, (5, 6)).astype(np.uint8)
              for _ in range(5)]
    df = spark.createDataFrame(
        [(0, "video", bytearray(encode_gif_frames(frames)), "cam"),
         (1, "video", bytearray(b"junk"), "cam")],
        "media_id bigint, kind string, content binary, source string")
    out = sample_frames(df, every=2).toPandas()
    assert sorted(out["frame_idx"]) == [0, 2, 4]
    assert (out["n_frames"] == 5).all()
    for _, r in out.iterrows():
        f = frames[int(r["frame_idx"])]
        assert abs(r["px_mean"] - f.mean()) < 1e-9
        assert (r["px_min"], r["px_max"]) == (f.min(), f.max())


def test_truncated_blobs_never_crash(spark):
    """One corrupt file must not fail a corpus-wide task: truncated
    headers/streams of every format yield decoded=False (or no frames),
    not an executor exception (struct.error etc. — review finding)."""
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import (
        decode_image, pixel_histogram_features, resize_images,
        sample_frames,
    )

    good = encode_gif_bytes(np.full((4, 4), 7, np.uint8))
    rows = [
        (0, "x", bytearray(b"GIF87a\x01"), "s"),          # 7-byte GIF
        (1, "x", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16), "s"),
        (2, "x", bytearray(b"\xff\xd8\xff\xc0\x00\x05\x08\x00\x10"), "s"),
        (3, "x", bytearray(good[:20]), "s"),               # cut stream
        (4, "x", bytearray(good), "s"),                    # one good
    ]
    df = spark.createDataFrame(
        rows, "media_id bigint, kind string, content binary, source string")
    out = {r.media_id: r for r in decode_image(df).collect()}
    assert len(out) == 5
    assert out[4].decoded and not out[3].decoded
    assert resize_images(df, 2, 2).count() == 5
    assert pixel_histogram_features(df).count() == 5
    sampled = sample_frames(df).toPandas()
    assert set(sampled["media_id"]) == {4}


def _raw_gif(global_palette: bytes | None,
             frames: "list[tuple[np.ndarray, bytes | None]]") -> bytes:
    """Hand-build a GIF89a stream: optional global color table, one
    image block per (index-frame, optional LOCAL color table)."""
    import struct as _struct

    from rainforest_spark.grid.gif import _lzw_encode

    h, w = frames[0][0].shape
    out = bytearray(b"GIF89a")
    packed = 0xF7 if global_palette else 0x07
    out += _struct.pack("<HHBBB", w, h, packed, 0, 0)
    if global_palette:
        assert len(global_palette) == 768
        out += global_palette
    for m, local in frames:
        ipacked = 0x87 if local else 0
        out += _struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
        if local:
            assert len(local) == 768
            out += local
        out += bytes([8])
        comp = _lzw_encode(np.ascontiguousarray(m, np.uint8).tobytes(), 8)
        for i in range(0, len(comp), 255):
            out += bytes([len(comp[i:i + 255])]) + comp[i:i + 255]
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_color_palette_maps_itu601():
    """A COLOR palette must map indices through the table (integer
    ITU-601), not read them as luminance (pre-round-6 silent-wrong)."""
    from rainforest_spark.operators.multimodal import _decode_plane

    # entry i -> pure red of intensity i: luminance = (i*299)//1000
    pal = bytes(b for i in range(256) for b in (i, 0, 0))
    m = np.arange(64, dtype=np.uint8).reshape(8, 8)
    fmt, w, h, plane = _decode_plane(_raw_gif(pal, [(m, None)]))
    assert (fmt, w, h) == ("gif", 8, 8)
    want = (m.astype(np.int64) * 299) // 1000
    np.testing.assert_array_equal(plane, want.astype(np.uint8))


def test_gif_grayscale_identity_palette_unchanged():
    """The grayscale identity ramp the DN encoders write maps each index
    to itself — bit-identical to the old index-IS-luminance path (q49's
    oracle depends on this)."""
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import _decode_plane

    m = (np.arange(64).reshape(8, 8) * 4 % 251).astype(np.uint8)
    _, _, _, plane = _decode_plane(encode_gif_bytes(m))
    np.testing.assert_array_equal(plane, m)


def test_gif_no_palette_is_undecodable():
    """No global AND no local color table: indices have no defined pixel
    values — decoded=False, never silently-wrong stats."""
    from rainforest_spark.operators.multimodal import _decode_plane

    m = np.zeros((4, 4), np.uint8)
    fmt, _, _, plane = _decode_plane(_raw_gif(None, [(m, None)]))
    assert fmt == "gif" and plane is None


def test_gif_local_palettes_per_frame(spark):
    """GIF89a local color tables apply to THEIR image only: a 2-frame
    stream where frame 1 carries a local non-identity grayscale table
    must map frame 0 through the global table and frame 1 through the
    local one."""
    from rainforest_spark.grid.gif import (
        decode_gif_frames_with_palettes, grayscale_palette,
        index_to_luminance,
    )
    from rainforest_spark.operators.multimodal import sample_frames

    m0 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    m1 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    inverted = bytes(b for i in range(256)
                     for b in (255 - i, 255 - i, 255 - i))
    buf = _raw_gif(grayscale_palette(), [(m0, None), (m1, inverted)])

    frames, pals = decode_gif_frames_with_palettes(buf)
    assert len(frames) == 2
    np.testing.assert_array_equal(index_to_luminance(frames[0], pals[0]), m0)
    np.testing.assert_array_equal(index_to_luminance(frames[1], pals[1]),
                                  255 - m1)

    df = spark.createDataFrame([(1, bytearray(buf))],
                               "media_id bigint, content binary")
    out = {r.frame_idx: r for r in
           sample_frames(df, every=1).collect()}
    assert out[0].px_min == 0 and out[0].px_max == 15
    assert out[1].px_min == 240 and out[1].px_max == 255


# ---------------------------------------------------------------- phash

def _structured_plane(seed: int, size: int = 48) -> np.ndarray:
    """Deterministic plane with real 2-D structure (gradient + blocks)
    so the DCT spectrum is non-trivial."""
    rng = np.random.RandomState(seed)
    base = np.add.outer(np.linspace(0, 200, size),
                        np.linspace(0, 55, size))
    blocks = rng.randint(0, 80, (6, 6)).repeat(size // 6, 0) \
        .repeat(size // 6, 1)[:size, :size]
    return np.clip(base + blocks, 0, 255).astype(np.uint8)


def test_phash_invariant_to_container_format(spark):
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.grid.png import encode_png_bytes
    from rainforest_spark.operators.multimodal import image_phash

    plane = _structured_plane(1)
    rows = [(0, bytearray(encode_gif_bytes(plane))),
            (1, bytearray(encode_png_bytes(plane)))]
    df = spark.createDataFrame(rows, "img_id long, content binary")
    got = {r.img_id: r.phash for r in image_phash(df).collect()}
    assert got[0] is not None and got[0] == got[1], \
        "same pixels in GIF vs PNG must hash identically"


def test_phash_resolution_invariant_and_edit_tolerant(spark):
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.operators.multimodal import image_phash

    plane = _structured_plane(2)
    up = plane.repeat(2, 0).repeat(2, 1)          # 2x NN upscale
    edited = plane.copy()
    edited[:4, :4] = 255                           # small local edit
    df = spark.createDataFrame(
        [(0, bytearray(encode_gif_bytes(plane))),
         (1, bytearray(encode_gif_bytes(up))),
         (2, bytearray(encode_gif_bytes(edited)))],
        "img_id long, content binary")
    got = {r.img_id: r.phash for r in image_phash(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[0], got[1]) <= 2, "2x upscale must barely move phash"
    assert 0 < ham(got[0], got[2]) <= 10, "small edit flips few bits"


def test_phash_neardup_pairs_end_to_end(spark):
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.grid.png import encode_png_bytes
    from rainforest_spark.operators.multimodal import phash_neardup_pairs

    a = _structured_plane(3)
    b = _structured_plane(4)                       # unrelated image
    a_png = encode_png_bytes(a)                    # re-encoded copy
    rows = [(0, bytearray(encode_gif_bytes(a))),
            (1, bytearray(a_png)),
            (2, bytearray(encode_gif_bytes(b))),
            (3, bytearray(b"not an image at all"))]
    df = spark.createDataFrame(rows, "img_id long, content binary")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in phash_neardup_pairs(df, "img_id",
                                          max_hamming=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0, \
        "re-encoded copy must pair at hamming 0"
    assert all(2 not in p and 3 not in p for p in pairs), \
        "unrelated and undecodable images must not pair"


# --------------------------------------------------------- audio fp

def _tone(seed: int, n: int = 400) -> np.ndarray:
    """Deterministic clip whose ENERGY ENVELOPE depends on the seed —
    the contour fingerprint sees envelopes, not phases, so distinct
    test clips must differ there (two clips sharing an envelope
    rightly collide)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    env = np.abs(np.sin(2 * np.pi * t / (90 + 17 * seed) + seed)) \
        * np.linspace(1.0, 0.3 + 0.1 * (seed % 5), n)
    wave = 8000 * env * np.sin(2 * np.pi * t / 50) \
        + rng.randint(-200, 200, n)
    return wave.astype(np.int16)


def test_audio_fingerprint_exact_and_noise_tolerant(spark):
    from rainforest_spark.grid.wav import encode_wav_bytes
    from rainforest_spark.operators.multimodal import audio_fingerprint

    a = _tone(1)
    noisy = (a.astype(np.int32)
             + np.random.RandomState(9).randint(-50, 50, a.size)) \
        .astype(np.int16)
    rows = [(0, bytearray(encode_wav_bytes(a))),
            (1, bytearray(encode_wav_bytes(a))),      # exact re-encode
            (2, bytearray(encode_wav_bytes(noisy))),
            (3, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "clip_id long, content binary")
    got = {r.clip_id: r for r in audio_fingerprint(df).collect()}
    assert got[0].audio_fp == got[1].audio_fp != None  # noqa: E711
    ham = bin((got[0].audio_fp ^ got[2].audio_fp)
              & ((1 << 64) - 1)).count("1")
    assert ham <= 8, "small noise must flip few contour bits"
    assert not got[3].decoded and got[3].audio_fp is None


def test_audio_fingerprint_too_short_is_null(spark):
    from rainforest_spark.grid.wav import encode_wav_bytes
    from rainforest_spark.operators.multimodal import audio_fingerprint

    df = spark.createDataFrame(
        [(0, bytearray(encode_wav_bytes(
            np.arange(10, dtype=np.int16))))],
        "clip_id long, content binary")
    r = audio_fingerprint(df).collect()[0]
    assert r.decoded and r.audio_fp is None


def test_audio_neardup_pairs_end_to_end(spark):
    from rainforest_spark.grid.wav import encode_wav_bytes
    from rainforest_spark.operators.multimodal import audio_neardup_pairs

    a, b = _tone(2), _tone(7)
    noisy = (a.astype(np.int32)
             + np.random.RandomState(5).randint(-30, 30, a.size)) \
        .astype(np.int16)
    rows = [(0, bytearray(encode_wav_bytes(a))),
            (1, bytearray(encode_wav_bytes(noisy))),
            (2, bytearray(encode_wav_bytes(b)))]
    df = spark.createDataFrame(rows, "clip_id long, content binary")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in audio_neardup_pairs(df, "clip_id",
                                          max_hamming=7).collect()}
    assert (0, 1) in pairs, "noisy copy must pair"
    assert all(2 not in p for p in pairs), "unrelated clip must not pair"


def test_incremental_phash_dedup_against_corpus(spark):
    # a persisted corpus of image signatures; a new batch pairs only
    # against the corpus (cost O(batch)), catching a re-encoded copy
    from rainforest_spark.grid.gif import encode_gif_bytes
    from rainforest_spark.grid.png import encode_png_bytes
    from rainforest_spark.operators.dedup import incremental_hamming_neardup
    from rainforest_spark.operators.multimodal import image_phash

    a, b, c = (_structured_plane(s) for s in (21, 22, 23))
    corpus = spark.createDataFrame(
        [(100, bytearray(encode_gif_bytes(a))),
         (101, bytearray(encode_gif_bytes(b)))],
        "img_id long, content binary")
    batch = spark.createDataFrame(
        [(0, bytearray(encode_png_bytes(a))),    # re-encode of corpus 100
         (1, bytearray(encode_gif_bytes(c)))],   # genuinely new
        "img_id long, content binary")
    csig = image_phash(corpus).select("img_id", "phash")
    bsig = image_phash(batch).select("img_id", "phash")
    pairs = {(r.batch_id, r.corpus_id): r.hamming
             for r in incremental_hamming_neardup(
                 bsig, csig, "img_id", "phash",
                 max_hamming=3).collect()}
    assert (0, 100) in pairs and pairs[(0, 100)] == 0
    assert all(bid != 1 for bid, _ in pairs), "new image must pass clean"
