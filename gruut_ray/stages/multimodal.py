"""Multimodal (image/audio/video) actor-pool stages.

Media payloads are opaque Arrow ``binary`` columns with typed metadata
columns alongside (mime, width/height, sample_rate, ...).  The Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is real
and tested; the codec inner step is pluggable because no image/audio
libraries exist in this container:

* ``decoder="fake"`` (default): a deterministic stand-in (parses the
  self-describing header produced by :func:`encode_fake_image` /
  :func:`encode_fake_audio`) so tests exercise the full path end-to-end;
* ``decoder="real"``: REAL pure-stdlib decode for PNG (zlib inflate +
  scanline unfiltering) and WAV (stdlib ``wave``) via
  :mod:`gruut_ray.stages.codecs`; JPEG/OGG/MP4 raise
  ``NotImplementedError`` at the documented external-lib integration
  point (the stage's poison-row guard degrades them to
  ``decode_ok=False`` instead of killing the job);
* ``decoder="auto"``: magic-sniffing union of both.

Scale notes: media rows are WIDE (MBs) — stages default to small
``batch_size`` so batch × concurrency fits worker heaps, and outputs drop
the raw payload column as soon as features are extracted (same rule as
html in the extract stage, SURVEY §7 hard part 6).
"""

from __future__ import annotations

import struct
import typing
import zlib

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"FIMG"
_AUD_MAGIC = b"FAUD"


# ---------------------------------------------------------------------------
# Deterministic fake codecs (stand-ins for real image/audio decoders)
# ---------------------------------------------------------------------------

def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Self-describing fake image: header + crc-seeded byte pattern."""
    header = _IMG_MAGIC + struct.pack("<III", width, height, seed)
    n = width * height * 3
    pattern = (np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
               + np.uint64(seed)) & np.uint64(0xFF)
    return header + pattern.astype(np.uint8).tobytes()


def decode_fake_image(data: bytes) -> np.ndarray:
    if data[:4] != _IMG_MAGIC:
        raise ValueError("not a fake image")
    width, height, seed = struct.unpack("<III", data[4:16])
    arr = np.frombuffer(data[16:16 + width * height * 3], dtype=np.uint8)
    return arr.reshape(height, width, 3)


def encode_fake_audio(n_samples: int, sample_rate: int = 16000,
                      seed: int = 0) -> bytes:
    header = _AUD_MAGIC + struct.pack("<III", n_samples, sample_rate, seed)
    t = np.arange(n_samples, dtype=np.float32)
    wave = np.sin(2 * np.pi * (220 + (seed % 10) * 55) * t / sample_rate)
    return header + (wave * 32767).astype(np.int16).tobytes()


def decode_fake_audio(data: bytes) -> typing.Tuple[np.ndarray, int]:
    if data[:4] != _AUD_MAGIC:
        raise ValueError("not a fake audio clip")
    n, rate, _seed = struct.unpack("<III", data[4:16])
    samples = np.frombuffer(data[16:16 + n * 2], dtype=np.int16)
    return samples.astype(np.float32) / 32767.0, rate


# ---------------------------------------------------------------------------
# Decoder resolution: fake | real | auto
# ---------------------------------------------------------------------------
#
# "real" decodes the formats the stdlib can (PNG via zlib, WAV via wave —
# gruut_ray.stages.codecs); unknown magic raises, with JPEG/OGG/MP4 as the
# documented external-lib integration point.  "auto" sniffs the magic and
# accepts fake OR real payloads — the default for tests that mix both.

def _decode_image_any(data: bytes, mode: str) -> np.ndarray:
    from gruut_ray.stages import codecs

    if data[:4] == _IMG_MAGIC and mode != "real":
        return decode_fake_image(data)
    if data[:8] == codecs.PNG_MAGIC and mode != "fake":
        return codecs.decode_png(data)
    if mode == "real" and data[:3] == b"\xff\xd8\xff":
        raise NotImplementedError(
            "JPEG needs PIL/libjpeg (not in this container); plug the "
            "codec in here")
    raise ValueError(f"unrecognized image payload for decoder={mode!r}")


def _decode_audio_any(data: bytes, mode: str):
    from gruut_ray.stages import codecs

    if data[:4] == _AUD_MAGIC and mode != "real":
        return decode_fake_audio(data)
    if data[:4] == b"RIFF" and mode != "fake":
        return codecs.decode_wav(data)
    if mode == "real" and data[:4] == b"OggS":
        raise NotImplementedError(
            "OGG needs soundfile/libsndfile; plug the codec in here")
    raise ValueError(f"unrecognized audio payload for decoder={mode!r}")


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------

class ImageFeatureStage:
    """binary image column → (width, height, mean_luma, phash64) features.

    Actor-pool stage: ``ds.map_batches(ImageFeatureStage, concurrency=N,
    batch_size=SMALL)``.  ``phash64`` is an 8×8 average-hash over the
    decoded pixels — enough for exact/near-dup joins on images."""

    def __init__(self, image_col: str = "image", decoder: str = "fake",
                 drop_payload: bool = True):
        if decoder not in ("fake", "real", "auto"):
            raise ValueError(decoder)
        self.image_col = image_col
        self.decoder = decoder
        self.drop_payload = drop_payload

    @staticmethod
    def _phash(pixels: np.ndarray) -> int:
        luma = pixels.mean(axis=2)
        h, w = luma.shape
        ys = np.linspace(0, h, 9, dtype=np.int64)
        xs = np.linspace(0, w, 9, dtype=np.int64)
        cells = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                block = luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                             xs[j]:max(xs[j + 1], xs[j] + 1)]
                cells[i, j] = block.mean() if block.size else 0.0
        bits = (cells > cells.mean()).reshape(-1)
        out = 0
        for b, bit in enumerate(bits):
            if bit:
                out |= 1 << b
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.image_col).to_pylist()
        widths, heights, lumas, hashes, ok = [], [], [], [], []
        for blob in blobs:
            try:
                pixels = _decode_image_any(blob, self.decoder)
                widths.append(pixels.shape[1])
                heights.append(pixels.shape[0])
                lumas.append(float(pixels.mean()))
                hashes.append(self._phash(pixels))
                ok.append(True)
            except Exception:
                widths.append(0); heights.append(0)
                lumas.append(0.0); hashes.append(0); ok.append(False)
        if self.drop_payload:
            batch = batch.drop_columns([self.image_col])
        batch = batch.append_column("width", pa.array(widths, type=pa.int32()))
        batch = batch.append_column("height", pa.array(heights, type=pa.int32()))
        batch = batch.append_column("mean_luma",
                                    pa.array(lumas, type=pa.float32()))
        batch = batch.append_column("phash64",
                                    pa.array(hashes, type=pa.uint64()))
        batch = batch.append_column("decode_ok", pa.array(ok, type=pa.bool_()))
        return batch


class ImageResizeStage:
    """binary image → resized binary image (nearest-neighbor on the fake
    codec; the real path plugs into the same signature)."""

    def __init__(self, width: int, height: int, image_col: str = "image",
                 decoder: str = "fake"):
        if decoder not in ("fake", "real", "auto"):
            raise ValueError(decoder)
        self.w = width
        self.h = height
        self.image_col = image_col
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gruut_ray.stages import codecs

        blobs = batch.column(self.image_col).to_pylist()
        out, ok = [], []
        for blob in blobs:
            try:  # poison-blob guard: pass corrupt payloads through
                pixels = _decode_image_any(blob, self.decoder)
                ys = (np.arange(self.h) * pixels.shape[0] // self.h)
                xs = (np.arange(self.w) * pixels.shape[1] // self.w)
                resized = pixels[ys][:, xs].astype(np.uint8)
                if blob[:8] == codecs.PNG_MAGIC:  # keep input format
                    out.append(codecs.encode_png(resized))
                else:
                    header = _IMG_MAGIC + struct.pack("<III", self.w,
                                                      self.h, 0)
                    out.append(header + resized.tobytes())
                ok.append(True)
            except Exception:
                out.append(blob)
                ok.append(False)
        batch = batch.drop_columns([self.image_col])
        batch = batch.append_column(self.image_col,
                                    pa.array(out, type=pa.binary()))
        if "decode_ok" in batch.column_names:
            batch = batch.drop_columns(["decode_ok"])
        return batch.append_column("decode_ok",
                                   pa.array(ok, type=pa.bool_()))


class AudioFeatureStage:
    """binary audio → (n_samples, sample_rate, duration_s, rms, clip_hash)."""

    def __init__(self, audio_col: str = "audio", decoder: str = "fake",
                 drop_payload: bool = True):
        if decoder not in ("fake", "real", "auto"):
            raise ValueError(decoder)
        self.audio_col = audio_col
        self.decoder = decoder
        self.drop_payload = drop_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.audio_col).to_pylist()
        ns, rates, durs, rmss, hashes, ok = [], [], [], [], [], []
        for blob in blobs:
            try:
                wave, rate = _decode_audio_any(blob, self.decoder)
                ns.append(len(wave))
                rates.append(rate)
                durs.append(len(wave) / rate if rate else 0.0)
                rmss.append(float(np.sqrt((wave ** 2).mean())) if len(wave) else 0.0)
                hashes.append(zlib.crc32(blob) & 0xFFFFFFFF)
                ok.append(True)
            except Exception:
                ns.append(0); rates.append(0); durs.append(0.0)
                rmss.append(0.0); hashes.append(0); ok.append(False)
        if self.drop_payload:
            batch = batch.drop_columns([self.audio_col])
        batch = batch.append_column("n_samples", pa.array(ns, type=pa.int64()))
        batch = batch.append_column("sample_rate",
                                    pa.array(rates, type=pa.int32()))
        batch = batch.append_column("duration_s",
                                    pa.array(durs, type=pa.float32()))
        batch = batch.append_column("rms", pa.array(rmss, type=pa.float32()))
        batch = batch.append_column("clip_hash",
                                    pa.array(hashes, type=pa.uint32()))
        batch = batch.append_column("decode_ok", pa.array(ok, type=pa.bool_()))
        return batch


def frame_sample(ds, *, every_n: int = 10, video_col: str = "video",
                 frame_col: str = "frame", concurrency=2, batch_size: int = 8):
    """Video → sampled frames, one output row per frame (flat_map shape).

    The fake "video" is a concatenation of fake images; a real build swaps
    the splitter for pyav keyframe iteration with the SAME output schema
    (doc keys + frame_idx + frame binary)."""

    def split(batch: pa.Table) -> pa.Table:
        keys = [c for c in batch.column_names if c != video_col]
        key_types = {c: batch.schema.field(c).type for c in keys}
        out_cols: typing.Dict[str, list] = {c: [] for c in keys}
        out_cols["frame_idx"] = []
        out_cols[frame_col] = []
        vids = batch.column(video_col).to_pylist()
        for row_i, vid in enumerate(vids):
            frames = []
            off = 0
            while off + 16 <= len(vid) and vid[off:off + 4] == _IMG_MAGIC:
                w, h, _ = struct.unpack("<III", vid[off + 4:off + 16])
                size = 16 + w * h * 3
                frames.append(vid[off:off + size])
                off += size
            for fi, frame in enumerate(frames):
                if fi % every_n:
                    continue
                for c in keys:
                    out_cols[c].append(batch.column(c)[row_i].as_py())
                out_cols["frame_idx"].append(fi)
                out_cols[frame_col].append(frame)
        # explicit types: a zero-frame batch would otherwise infer
        # null-typed columns and break block schema unification
        arrays = {c: pa.array(out_cols[c], type=key_types[c]) for c in keys}
        arrays["frame_idx"] = pa.array(out_cols["frame_idx"],
                                       type=pa.int32())
        arrays[frame_col] = pa.array(out_cols[frame_col], type=pa.binary())
        return pa.table(arrays)

    return ds.map_batches(split, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
