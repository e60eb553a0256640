"""Pure-stdlib media codecs (no PIL / soundfile in this container).

* PNG decode/encode — from the public PNG spec (RFC 2083): chunk walk,
  zlib inflate, scanline unfiltering (all five filter types), 8-bit
  gray / gray+alpha / RGB / RGBA / palette.  16-bit depth and Adam7
  interlace are rejected with a clear error (rare in web corpora and
  cheap to add when needed).
* WAV decode/encode — stdlib ``wave`` (PCM 8/16/32-bit).

These make the multimodal stages' ``decoder="real"`` path REAL for the
two formats a sandboxed pipeline can actually produce and verify
end-to-end; JPEG/OGG/MP4 still need external libs and keep the
documented ``NotImplementedError`` integration point.
"""

from __future__ import annotations

import io
import struct
import typing
import wave as _wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering.  Row layout: 1 filter byte +
    width*bpp data bytes.  Sub is a per-lane cumulative sum (vectorized
    mod-256 cumsum); Up is fully vectorized; Average/Paeth walk the row
    (they depend on the just-reconstructed left neighbor)."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    raw_arr = np.frombuffer(raw, dtype=np.uint8)
    if len(raw_arr) < height * (stride + 1):
        raise ValueError("PNG: truncated image data")
    rows = raw_arr[:height * (stride + 1)].reshape(height, stride + 1)
    for y in range(height):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(
            stride, dtype=np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: cumsum per byte lane, mod 256
            lanes = line.reshape(width, bpp)
            rec = (np.cumsum(lanes, axis=0) % 256).reshape(stride)
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: left-dependent walk
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 3:
                    rec[i] = (line[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (
                        b if pb <= pc else c)
                    rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (height, width, 3) uint8 RGB array (alpha dropped,
    gray broadcast, palette resolved)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, \
                interlace = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth}")
    if interlace:
        raise ValueError("PNG: Adam7 interlace not supported")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        return palette[px[:, :, 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color_type == 6:
        return px[:, :, :3].copy()
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (filter 0 scanlines)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_wav(data: bytes) -> typing.Tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono."""
    with _wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        sw = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(
            np.float32) / 2147483648.0
    else:
        raise ValueError(f"WAV: unsupported sample width {sw}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float32 mono [-1, 1] → 16-bit PCM WAV bytes."""
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.rint(np.clip(samples, -1.0, 1.0)
                              * 32767.0).astype("<i2").tobytes())
    return buf.getvalue()
