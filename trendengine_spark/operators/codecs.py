"""Pure-stdlib media codecs for the multimodal operators.

The runtime has no Pillow/libav, but two real formats are decodable
with nothing beyond the standard library + numpy:

- **PNG** — zlib (stdlib) inflate + per-scanline unfilter (spec
  filters 0-4: None/Sub/Up/Average/Paeth), 8-bit depth, grayscale /
  gray+alpha / RGB / RGBA, non-interlaced. A matching minimal encoder
  (filter 0) exists so tests can round-trip without any external
  image library.
- **WAV** — stdlib ``wave`` for PCM payloads.

This turns ``multimodal.decode_image_batch(fake=False)`` into a real
decode path for PNG payloads; other compressed formats (JPEG, MP4…)
remain honestly stubbed behind ``NotImplementedError`` — implementing
a JPEG entropy decoder is out of scope, and the container forbids
installing codec libraries.

Decode cost model at scale: decode runs inside ``mapInPandas``
partition-local (no shuffle carries pixel data); the per-image Python
loop over scanlines is bounded by image height, and the zlib inflate
dominates — same asymptotics as a C decoder, constant factor higher.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_MAGIC


def png_encode(arr: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit, filter 0, one IDAT). Accepts (H, W)
    grayscale or (H, W, C) with C in {1, 2, 3, 4}."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (H, W, C) uint8.

    Implements the full filter set from the PNG spec (RFC 2083 §6):
    scanline reconstruction is sequential by definition (each byte may
    reference the reconstructed left/up neighbors), so rows decode in
    a Python loop — vectorized per-row for filters None/Up, per-byte
    only where the spec forces it (Sub/Average/Paeth left-dependency).
    """
    if not is_png(data):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8 supported)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype == 1:  # Sub
            recon = line.copy()
            for x in range(bpp, stride):
                recon[x] = (int(recon[x]) + int(recon[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                recon[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (int(line[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out.reshape(height, width, channels)


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV payload → (sample_rate, samples[n, channels])
    as int16/int32/uint8 depending on sample width."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {width}")
    arr = np.frombuffer(frames, dtype=dtype)
    return rate, arr.reshape(-1, ch)


def wav_encode(rate: int, samples: np.ndarray) -> bytes:
    """Minimal PCM WAV writer for round-trip tests (int16 samples)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(a.tobytes())
    return buf.getvalue()
