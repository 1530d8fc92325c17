"""Pure-python WAV (RIFF PCM) codec — the audio leg of the multimodal
codec family (gif.py, png.py, jpeg.py).

WAV is the archival PCM container: RIFF header, ``fmt `` chunk
(PCM format 1), ``data`` chunk of interleaved little-endian samples.
Decode supports 16-bit signed and 8-bit unsigned PCM, any channel
count (channel 0 is returned — the stats path needs one waveform, and
deterministic channel selection keeps the oracle exact).  Encode writes
16-bit mono.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_bytes(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → 16-bit PCM WAV bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = bytearray()
    out += b"RIFF"
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def decode_wav_bytes(buf: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (channel-0 samples as int32, sample_rate, n_channels).

    8-bit PCM (unsigned) is recentred to signed (−128 offset) so both
    depths share the zero-centred convention downstream stats assume."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        ln = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)           # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt_code != 1:
                raise ValueError(f"non-PCM WAV (format {fmt_code})")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    if channels > 1:
        arr = arr[::channels]              # channel 0
    return arr, rate, channels
