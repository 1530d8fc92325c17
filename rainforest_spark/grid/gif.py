"""Pure-python GIF87a codec for DN raster products (SURVEY S12/S15).

The reference reads Cartesian GIF archives (RZC/CPC) with PIL and
writes palette GIFs (io_data.py:262-292 read, :231-259 write).  This
container has no PIL here, so the codec is implemented from the public
GIF87a specification: logical screen descriptor + 256-entry global
color table + one image block, LZW-compressed with variable code width
(8-bit min code size, 12-bit cap, spec-conventional width-change
pairing — interoperates with PIL/giflib-written archives).

The DN byte plane IS the pixel plane: dn_encode's output (grid/io.py)
round-trips through the GIF unchanged, and decode back to mm/h is
``SCALE_CPC[dn]`` exactly like the reference's
``constants.SCALE_CPC[data]`` (io_data.py:203).

Scale note: encoding a 640×710 byte plane is driver-side by design —
the GIF is a sink artifact (~0.5 MB); everything before grid_to_matrix
is distributed.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_CODE_SIZE = 12


def grayscale_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    cur, nbits = 0, 0

    def emit(code: int, size: int):
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, \
            min_code_size + 1

    table, next_code, code_size = fresh()
    emit(clear, code_size)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code < (1 << MAX_CODE_SIZE):
            table[wc] = next_code
            next_code += 1
            # conventional pairing: the decoder lags one table entry, so
            # the encoder widens one entry LATER than the decoder — when
            # next_code == (1 << code_size) + 1 post-insert
            if next_code == (1 << code_size) + 1 \
                    and code_size < MAX_CODE_SIZE:
                code_size += 1
        else:
            emit(clear, code_size)
            table, next_code, code_size = fresh()
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    pos, cur, nbits = 0, 0, 0

    def read(size: int):
        nonlocal pos, cur, nbits
        while nbits < size:
            if pos >= len(data):
                return None
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << size) - 1)
        cur >>= size
        nbits -= size
        return code

    out = bytearray()
    table, next_code, code_size = None, end + 1, min_code_size + 1
    prev = None
    while True:
        code = read(code_size)
        if code is None or code == end:
            break
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code, code_size = end + 1, min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if prev is not None and next_code < (1 << MAX_CODE_SIZE):
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            # conventional rule: widen as soon as the table fills the
            # current width (interoperates with PIL/giflib/browsers)
            if next_code == (1 << code_size) \
                    and code_size < MAX_CODE_SIZE:
                code_size += 1
        prev = code
    return bytes(out)


def encode_gif_bytes(matrix: np.ndarray,
                     palette: bytes | None = None) -> bytes:
    """uint8 DN matrix (rows, cols) → single-image GIF87a bytes with a
    global 256-color palette (grayscale when none given)."""
    m = np.ascontiguousarray(matrix, dtype=np.uint8)
    h, w = m.shape
    palette = palette or grayscale_palette()
    assert len(palette) == 768, "palette must be 256 RGB triples"
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out += bytes([8])
    comp = _lzw_encode(m.tobytes(), 8)
    for i in range(0, len(comp), 255):
        chunk = comp[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def write_gif(matrix: np.ndarray, path: str,
              palette: bytes | None = None) -> None:
    """uint8 DN matrix (rows, cols) → single-image GIF87a file."""
    with open(path, "wb") as f:
        f.write(encode_gif_bytes(matrix, palette))


def decode_gif_frames_with_palettes(
        buf: bytes, max_frames: int | None = None
        ) -> tuple[list[np.ndarray], list[bytes]]:
    """GIF bytes → (ALL image-block frames of PALETTE INDICES, one
    palette per frame) — the animated-GIF case (GIF89a multi-image
    streams; graphic-control extensions are skipped like any
    extension).  Per GIF89a a local color table applies to ITS image
    only, so each frame's palette is its local table when present,
    else the global table (possibly ``b""`` when neither exists —
    callers that need pixel VALUES must then treat the frame as
    uninterpretable; see ``index_to_luminance``).  Only full-logical-
    screen frames are supported (the encoders here write no partial
    updates); no interlace."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _, _ = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    global_palette = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_palette = buf[pos:pos + n]
        pos += n
    frames: list[np.ndarray] = []
    palettes: list[bytes] = []
    while pos < len(buf):
        block = buf[pos]
        if block == 0x21:               # extension: skip sub-blocks
            pos += 2
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif block == 0x2C:
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", buf[pos + 1:pos + 10])
            pos += 10
            local_palette = b""
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 0x07))
                local_palette = buf[pos:pos + n]
                pos += n
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            if (left, top, iw, ih) != (0, 0, w, h):
                raise ValueError("partial-frame GIF not supported")
            min_code = buf[pos]
            pos += 1
            comp = bytearray()
            while buf[pos]:
                ln = buf[pos]
                comp += buf[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1                    # block terminator
            pixels = _lzw_decode(bytes(comp), min_code)
            frames.append(np.frombuffer(pixels[:iw * ih],
                                        dtype=np.uint8).reshape(ih, iw))
            palettes.append(local_palette or global_palette)
            if max_frames and len(frames) >= max_frames:
                return frames, palettes
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no image block found")
    return frames, palettes


def index_to_luminance(frame: np.ndarray,
                       palette: bytes) -> "np.ndarray | None":
    """Palette-index frame → uint8 luminance plane, THROUGH the palette.

    One vectorized LUT covers every case: per-entry integer ITU-R 601-2
    (``(R·299 + G·587 + B·114) // 1000`` — the same weights as
    grid/png.py, exact for r==g==b entries), so the grayscale identity
    ramp the DN encoders write maps each index to itself (bit-identical
    to the old index-IS-luminance shortcut) while a foreign color or
    non-identity palette maps CORRECTLY instead of silently wrong.
    Returns None when the frame is uninterpretable as pixel values: no
    palette at all, or an index beyond the declared table."""
    if not palette:
        return None
    pal = np.frombuffer(palette, dtype=np.uint8)
    pal = pal[:(len(pal) // 3) * 3].reshape(-1, 3).astype(np.int32)
    if pal.shape[0] == 0 or int(frame.max(initial=0)) >= pal.shape[0]:
        return None
    lut = (pal[:, 0] * 299 + pal[:, 1] * 587 + pal[:, 2] * 114) // 1000
    return lut.astype(np.uint8)[frame]


def decode_gif_frames(buf: bytes,
                      max_frames: int | None = None
                      ) -> tuple[list[np.ndarray], bytes]:
    """Back-compat wrapper: (frames of palette indices, ONE palette —
    the last frame's).  DN-grid readers (grid/io.py) use this: there the
    index IS the data value and the palette is visualization metadata.
    Pixel-value consumers (operators/multimodal.py) use
    ``decode_gif_frames_with_palettes`` + ``index_to_luminance``."""
    frames, palettes = decode_gif_frames_with_palettes(buf, max_frames)
    return frames, palettes[-1] if palettes else b""


def decode_gif_bytes(buf: bytes) -> tuple[np.ndarray, bytes]:
    """Single-image GIF bytes → (uint8 DN matrix, palette bytes)."""
    frames, palette = decode_gif_frames(buf, max_frames=1)
    return frames[0], palette


def encode_gif_frames(frames: list[np.ndarray],
                      palette: bytes | None = None) -> bytes:
    """uint8 frames (same shape) → multi-image GIF89a (an animation
    stream without timing extensions — frame extraction is what the
    pipelines sample, not playback)."""
    assert frames, "need at least one frame"
    h, w = frames[0].shape
    palette = palette or grayscale_palette()
    assert len(palette) == 768
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette
    for m in frames:
        m = np.ascontiguousarray(m, dtype=np.uint8)
        assert m.shape == (h, w), "frames must share the logical screen"
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out += bytes([8])
        comp = _lzw_encode(m.tobytes(), 8)
        for i in range(0, len(comp), 255):
            chunk = comp[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def read_gif(path: str) -> tuple[np.ndarray, bytes]:
    """Single-image GIF file → (uint8 DN matrix, palette bytes)."""
    with open(path, "rb") as f:
        return decode_gif_bytes(f.read())


def save_grid_gif(grid_df, value_col: str, out_path: str,
                  scale: np.ndarray | None = None,
                  palette: bytes | None = None,
                  nx: int = 710, ny: int = 640) -> None:
    """Grid pixels → DN bytes (searchsorted scale, grid/io.py) → GIF
    sink, mirroring the reference's DN/gif output path (qpe.py:270-292).
    NaN pixels get DN 255 like the reference's MASK_NAN."""
    from rainforest_spark.grid.io import scale_cpc
    from rainforest_spark.grid.qpe import grid_to_matrix

    scale = scale_cpc() if scale is None else scale
    m = grid_to_matrix(grid_df, value_col, nx=nx, ny=ny)
    dn = np.searchsorted(scale, np.nan_to_num(m, nan=0.0))
    # 255 is reserved for NaN: finite values above the scale top clamp
    # to 254 so they never alias the NaN sentinel on decode
    dn = np.clip(dn, 0, 254).astype(np.uint8)
    dn[~np.isfinite(m)] = 255
    write_gif(dn, out_path, palette)


def load_grid_gif(spark, path: str, scale: np.ndarray | None = None):
    """GIF → long (x_idx, y_idx, dn, value) DataFrame: the read side of
    the archive path (io_data.py:195-206 — DN bytes indexed into
    SCALE_CPC; row 0 is the northernmost band, so y_idx flips back)."""
    import pandas as pd

    from rainforest_spark.grid.io import scale_cpc

    scale = scale_cpc() if scale is None else scale
    m, _ = read_gif(path)
    ny, nx = m.shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    dn = m.ravel().astype(np.int32)
    pdf = pd.DataFrame({
        "x_idx": xx.ravel().astype(np.int32),
        "y_idx": (ny - 1 - yy.ravel()).astype(np.int32),
        "dn": dn,
        # NaN for the 255 sentinel AND any code past a short scale's end
        "value": np.where((dn == 255) | (dn >= len(scale)), np.nan,
                          scale[np.minimum(dn, len(scale) - 1)]),
    })
    return spark.createDataFrame(pdf)
