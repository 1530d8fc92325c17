"""Pure-python PNG codec (SURVEY S12-adjacent; multimodal decode).

The reference reads raster products with PIL (common/io_data.py:262-292)
— PIL is absent in this container, so, like the GIF87a codec (gif.py),
this implements the subset the pipelines need from the public PNG
specification using only stdlib ``zlib``:

- decode: 8-bit greyscale (color type 0), RGB (2), greyscale+alpha (4)
  and RGBA (6), non-interlaced, all five per-row filters;
- encode: 8-bit greyscale, filter 0 rows (enough for tests and DN
  sinks — compression ratio is zlib's business).

RGB collapses to luminance with the ITU-R 601-2 integer formula
``L = (R·299 + G·587 + B·114) // 1000`` — the same weights PIL's
``convert('L')`` uses, so the PIL-gated path and this one agree.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel, per PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png_bytes(matrix: np.ndarray) -> bytes:
    """uint8 matrix → 8-bit PNG, filter-0 rows: (rows, cols) encodes
    greyscale (color type 0), (rows, cols, 3) encodes RGB (type 2)."""
    m = np.ascontiguousarray(matrix, dtype=np.uint8)
    if m.ndim == 2:
        h, w, ctype = m.shape[0], m.shape[1], 0
    elif m.ndim == 3 and m.shape[2] == 3:
        h, w, ctype = m.shape[0], m.shape[1], 2
    else:
        raise ValueError("expect (h, w) grey or (h, w, 3) RGB")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + m[r].tobytes() for r in range(h))
    return (_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Undo per-row filtering → (h, w·ch) uint8 samples."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1:pos + 1 + stride],
                            dtype=np.uint8).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:                       # None
            cur = row
        elif ftype == 2:                     # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:                     # Sub: per-lane prefix sum
            # cur[i] = (row[i] + cur[i-ch]) mod 256 — mod distributes
            # over addition, so a plain cumsum per channel lane then one
            # final mask is exact (w·255 ≪ 2³¹, no overflow)
            cur = (np.cumsum(row.reshape(-1, ch), axis=0).ravel()
                   & 0xFF)
        elif ftype in (3, 4):                # Average / Paeth (serial)
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                if ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                cur[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png_bytes(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 luminance plane (rows, cols).

    Greyscale passes through; RGB(A) collapses via integer ITU-R 601-2;
    alpha is ignored (the products carry no transparency semantics)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(buf):
        ln, tag = struct.unpack(">I4s", buf[pos:pos + 8])
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth {depth}, color {ctype})")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[ctype]
    samples = _unfilter(zlib.decompress(bytes(idat)), w, h, ch)
    px = samples.reshape(h, w, ch)
    if ctype == 0:
        return px[:, :, 0]
    if ctype == 4:                           # grey + alpha
        return px[:, :, 0]
    rgb = px[:, :, :3].astype(np.int64)
    return ((rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
             + rgb[:, :, 2] * 114) // 1000).astype(np.uint8)
