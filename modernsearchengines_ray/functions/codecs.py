"""Real media codecs from the standard library: PNG and BMP images
(zlib + numpy), WAV audio (``wave``).

These back the multimodal stages' ``codec="real"`` path
(stages/multimodal.py).  Scope is the formats a container with no
image/audio libraries can still decode honestly:

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), all five scanline filters, non-interlaced.  Anything else
  raises ``UnsupportedMediaError`` (wire Pillow for JPEG/WebP — the
  stage falls back to it when importable).
- BMP: 24-bit uncompressed BI_RGB, bottom-up or top-down.
- WAV: integer PCM (8/16/32-bit) via the stdlib ``wave`` module.

Encoders exist so tests and fixtures can synthesize payloads
deterministically without any external library; they are NOT a general
image-writing API (PNG always writes filter 0).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedMediaError(ValueError):
    """Payload is a recognized container but an unsupported variant,
    or an unrecognized container entirely."""


def sniff_mime(payload: bytes) -> str | None:
    """Magic-byte container sniff; None when unrecognized."""
    if payload[:8] == _PNG_SIG:
        return "image/png"
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C) with C in {1, 2, 3, 4} -> PNG
    bytes (filter 0 on every scanline)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (H, W, C) array; see module docstring for
    the supported subset."""
    if payload[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG")
    pos = 8
    width = height = None
    channels = 0
    idat = io.BytesIO()
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + tag + data + crc
            if tag == b"IHDR":
                width, height, depth, color, comp, filt, interlace = \
                    struct.unpack(">IIBBBBB", data)
                if depth != 8:
                    raise UnsupportedMediaError(f"bit depth {depth}")
                if color not in _PNG_CHANNELS:
                    raise UnsupportedMediaError(f"color type {color}")
                if interlace != 0:
                    raise UnsupportedMediaError("interlaced PNG")
                channels = _PNG_CHANNELS[color]
            elif tag == b"IDAT":
                idat.write(data)
            elif tag == b"IEND":
                break
    except struct.error as e:  # truncated chunk header / IHDR
        raise UnsupportedMediaError(f"truncated PNG: {e}") from e
    if width is None:
        raise UnsupportedMediaError("missing IHDR")
    try:
        raw = zlib.decompress(idat.getvalue())
    except zlib.error as e:  # truncated / corrupt IDAT stream
        raise UnsupportedMediaError(f"corrupt PNG IDAT: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedMediaError("IDAT size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1)
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up — fully vectorized
            cur = line + prev
        elif f == 1:  # Sub — sequential along the row (ints: uint8
            # scalar adds overflow-warn per pixel and would raise
            # under warnings-as-errors)
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) \
                    & 0xFF
        else:
            raise UnsupportedMediaError(f"scanline filter {f}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, channels)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB array -> bottom-up 24-bit BMP bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("BMP encoder takes (H, W, 3) RGB")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = io.BytesIO()
    for y in range(h - 1, -1, -1):  # bottom-up
        body.write(a[y, :, ::-1].tobytes())  # RGB -> BGR
        body.write(b"\x00" * pad)
    pixels = body.getvalue()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> uint8 (H, W, 3) RGB array."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    try:
        (off,) = struct.unpack_from("<I", payload, 10)
        dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
        bpp, = struct.unpack_from("<H", payload, 28)
        compression, = struct.unpack_from("<I", payload, 30)
    except struct.error as e:  # truncated header
        raise UnsupportedMediaError(f"truncated BMP: {e}") from e
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"BMP variant bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if w < 0 or off + stride * h > len(payload):
        raise UnsupportedMediaError("truncated BMP pixel data")
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off)
    rows = data.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# WAV (integer PCM via the stdlib wave module)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, channels) PCM -> WAV bytes."""
    a = np.ascontiguousarray(samples, dtype=np.int16)
    n_channels = 1 if a.ndim == 1 else a.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()


_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, float64 samples normalized to
    [-1, 1), shape (n_frames, channels))."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate = f.getframerate()
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(str(e)) from e
    if width not in _WAV_DTYPES:
        raise UnsupportedMediaError(f"sample width {width}")
    raw = np.frombuffer(frames, dtype=_WAV_DTYPES[width])
    if width == 1:  # 8-bit WAV is unsigned, midpoint 128
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        samples = raw.astype(np.float64) / float(1 << (8 * width - 1))
    return rate, samples.reshape(-1, n_ch)
