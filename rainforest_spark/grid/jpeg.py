"""Pure-python baseline JPEG codec (luminance path).

Completes the multimodal decode family (gif.py, png.py): the container
has no PIL, so baseline sequential DCT JPEG (ITU T.81) is implemented
from the public specification —

- decode: SOI/DQT/SOF0/DHT/SOS/DRI marker parse, Huffman entropy
  decode with 0xFF00 byte unstuffing and restart markers, DC
  differential + AC run-length, dequantize → de-zigzag → float IDCT
  (orthonormal 8×8 DCT basis, two matrix products per block), returning
  the LUMINANCE (Y) plane only — chroma blocks are entropy-decoded (the
  stream is interleaved; they must be consumed) but not reconstructed.
  That is exactly what the multimodal feature path needs: PIL's
  ``convert('L')`` is likewise Y-first for JFIF data.
- encode (tests + sinks): single-component (grayscale) baseline with
  the T.81 Annex K luminance quantization and Huffman tables, quality
  scaling per the classic IJG curve.

JPEG is lossy: tests assert reconstruction ERROR BOUNDS (tight at high
quality) plus exact unit properties (zigzag inverse, Huffman table
construction, IDCT orthonormality), not bit equality.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: zigzag index order: ZIGZAG[i] = raster position of the i-th coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

#: T.81 Annex K.1 luminance quantization table (raster order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

#: T.81 Annex K.3: luminance DC — (BITS counts per code length, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))

#: T.81 Annex K.3: luminance AC
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis A: X_freq = A · x · Aᵀ."""
    a = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(0.125) if k == 0 else 0.5
        a[k] = c * np.cos((2 * np.arange(8) + 1) * k * np.pi / 16)
    return a


_A = _dct_basis()


def _quality_table(quality: int) -> np.ndarray:
    """Classic IJG quality scaling of the Annex K luminance table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (QUANT_LUMA * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# ---------------------------------------------------------------- huffman


def build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """T.81 C.2 canonical code assignment → {(length, code): symbol}."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:     # RST handled by caller
                return False
            else:
                return False
            self.cur = ((self.cur << 8) | b) & 0xFFFFFFFF
        else:
            self.pos += 1
            self.cur = ((self.cur << 8) | b) & 0xFFFFFFFF
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0                       # pad past final marker
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_to_rst(self) -> None:
        """Discard partial byte, consume an RSTn marker."""
        self.nbits = 0
        while self.buf[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2                      # FF Dn

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decode


def decode_jpeg_bytes(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 LUMINANCE plane (rows, cols)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}   # (class, id) → table
    comps = None
    w = h = 0
    restart = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack(">H", buf[pos + 2:pos + 4])[0]
        seg = buf[pos + 4:pos + 2 + ln]
        if marker == 0xDB:                                    # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                z = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = z                                 # de-zigzag
                qtables[tid] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC0:                                  # SOF0
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            for c in range(n):
                cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 0x0F, "q": qid})
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:                                  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                htables[(cls, tid)] = build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:                                  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                                  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                scan.append({**comp, "dc": tt >> 4, "ac": tt & 0x0F})
            data_pos = pos + 2 + ln
            return _decode_scan(buf, data_pos, scan, qtables, htables,
                                w, h, restart)
        pos += 2 + ln
    raise ValueError("no SOS marker found")


def _decode_block(r: _BitReader, dc_tab, ac_tab, pred: int):
    """One 8×8 block of zigzag coefficients; returns (coeffs, new DC)."""
    z = np.zeros(64, np.int32)
    t = r.decode_symbol(dc_tab)
    diff = _extend(r.read_bits(t), t)
    pred += diff
    z[0] = pred
    k = 1
    while k < 64:
        rs = r.decode_symbol(ac_tab)
        rr, ss = rs >> 4, rs & 0x0F
        if ss == 0:
            if rr == 15:                  # ZRL
                k += 16
                continue
            break                         # EOB
        k += rr
        if k > 63:
            break
        z[k] = _extend(r.read_bits(ss), ss)
        k += 1
    return z, pred


def _decode_scan(buf, pos, scan, qtables, htables, w, h, restart):
    if len(scan) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — data
        # units walk the component in raster order, one 8x8 block per
        # "MCU", ceil(w/8) per row, REGARDLESS of the declared sampling
        # factors.  (A grey JPEG declaring e.g. 2x2 sampling would
        # otherwise be mis-walked in 16x16 MCU order — usually a caught
        # Huffman error, occasionally silently wrong pixels.)  Forcing
        # h=v=1 makes the interleaved walk below degenerate to exactly
        # that raster order.
        scan = [{**scan[0], "h": 1, "v": 1}]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    y_comp = scan[0]                      # first component is Y/grey
    yw, yh = 8 * y_comp["h"] * mcux, 8 * y_comp["v"] * mcuy
    plane = np.zeros((yh, yw), np.float64)
    q_y = qtables[y_comp["q"]].astype(np.float64)

    r = _BitReader(buf, pos)
    preds = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.byte_align_to_rst()
                preds = {c["id"]: 0 for c in scan}
            for c in scan:
                dc_tab = htables[(0, c["dc"])]
                ac_tab = htables[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        z, preds[c["id"]] = _decode_block(
                            r, dc_tab, ac_tab, preds[c["id"]])
                        if c is not y_comp:
                            continue      # consume chroma, keep luma
                        coeff = np.zeros(64, np.float64)
                        coeff[ZIGZAG] = z
                        blk = coeff.reshape(8, 8) * q_y
                        px = _A.T @ blk @ _A + 128.0
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        plane[r0:r0 + 8, c0:c0 + 8] = px
            mcu_count += 1
    return np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


def encode_jpeg_bytes(matrix: np.ndarray, quality: int = 90,
                      components: int = 1,
                      restart_interval: int = 0) -> bytes:
    """uint8 greyscale matrix → baseline JPEG.

    ``components=3`` writes a 4:4:4 YCbCr stream whose chroma blocks
    are all-zero (grey image) — the pixel content is identical but the
    scan is interleaved like a camera JPEG, exercising the decoder's
    multi-component path.  ``restart_interval`` emits DRI + RSTn
    markers every N MCUs."""
    m = np.ascontiguousarray(matrix, dtype=np.uint8)
    h, w = m.shape
    qt = _quality_table(quality)

    out = bytearray(b"\xff\xd8")                           # SOI

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    zz = np.zeros(64, np.uint8)
    zz[:] = qt.reshape(64)[ZIGZAG]                         # zigzag order
    seg(0xDB, bytes([0x00]) + zz.tobytes())                # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, components)
    for cid in range(1, components + 1):
        sof += bytes([cid, 0x11, 0])
    seg(0xC0, sof)                                         # SOF0
    seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
        + bytes(DC_LUMA_VALS))                             # DHT DC 0
    seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
        + bytes(AC_LUMA_VALS))                             # DHT AC 0
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))     # DRI
    sos = bytes([components])
    for cid in range(1, components + 1):
        sos += bytes([cid, 0x00])
    seg(0xDA, sos + bytes([0, 63, 0]))                     # SOS

    # canonical encode tables: symbol → (code, length)
    def enc_table(bits, vals):
        dec = build_huffman(bits, vals)
        return {sym: (code, ln) for (ln, code), sym in dec.items()}

    dc_t = enc_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_t = enc_table(AC_LUMA_BITS, AC_LUMA_VALS)

    bitbuf, nbits = 0, 0
    payload = bytearray()

    def emit(code: int, ln: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << ln) | code
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            b = (bitbuf >> nbits) & 0xFF
            payload.append(b)
            if b == 0xFF:
                payload.append(0x00)                       # stuffing

    def magnitude(v: int):
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    def emit_block(q, pred):
        diff = int(q[0]) - pred
        t, mag = magnitude(diff) if diff else (0, 0)
        code, ln = dc_t[t]
        emit(code, ln)
        if t:
            emit(mag, t)
        run = 0
        last_nz = max(np.nonzero(q[1:])[0]) + 1 if q[1:].any() else 0
        for k in range(1, last_nz + 1):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c_, l_ = ac_t[0xF0]                        # ZRL
                emit(c_, l_)
                run -= 16
            t, mag = magnitude(v)
            c_, l_ = ac_t[(run << 4) | t]
            emit(c_, l_)
            emit(mag, t)
            run = 0
        if last_nz < 63:
            c_, l_ = ac_t[0x00]                            # EOB
            emit(c_, l_)
        return int(q[0])

    def byte_align():
        nonlocal nbits
        if nbits:
            pad = 8 - nbits
            emit((1 << pad) - 1, pad)

    qt8 = qt.reshape(8, 8).astype(np.float64)
    zero_block = np.zeros(64, np.int32)
    preds = [0] * components
    mcu_count = 0
    rst_n = 0
    for r0 in range(0, -(-h // 8) * 8, 8):
        for c0 in range(0, -(-w // 8) * 8, 8):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                byte_align()
                payload.extend(bytes([0xFF, 0xD0 + rst_n]))
                rst_n = (rst_n + 1) % 8
                preds = [0] * components
            blk = np.full((8, 8), 128.0)
            rr = min(8, h - r0)
            cc = min(8, w - c0)
            blk[:rr, :cc] = m[r0:r0 + rr, c0:c0 + cc].astype(np.float64)
            coeff = _A @ (blk - 128.0) @ _A.T
            q = np.round(coeff / qt8).astype(np.int32).reshape(64)[ZIGZAG]
            preds[0] = emit_block(q, preds[0])
            for c in range(1, components):                 # flat chroma
                preds[c] = emit_block(zero_block, preds[c])
            mcu_count += 1
    byte_align()
    out.extend(payload)
    out.extend(b"\xff\xd9")                                # EOI
    return bytes(out)
