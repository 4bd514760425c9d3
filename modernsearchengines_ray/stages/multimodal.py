"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as Arrow
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages (decoder state loaded once per actor).  Two
codecs exist:

- ``codec="real"`` genuinely decodes PNG / BMP images (pure-stdlib
  zlib decoder, functions/codecs.py) and integer-PCM WAV audio
  (stdlib ``wave``), falling back to Pillow for other image formats
  WHEN importable (it isn't in this container — that path is
  skip-marked in tests like the live spaCy/BERT paths).  Unsupported
  payloads raise ``UnsupportedMediaError`` loudly.
- ``codec="fake"`` (default) derives deterministic pseudo metadata
  from the payload bytes (md5-seeded) — the SQL-gatable oracle for
  the Ray-side plumbing (schema, batch size, actor signature, output
  layout, partitioned writes).

Schema contract per modality:

  media(item_id: int64, payload: binary, mime: string)
    -> fake image features: (item_id, width, height, channels, mean_luma)
    -> real image features: (item_id, width, height, channels,
                             mean_luma, luma_sum)  — luma_sum is the
       integer sum of all pixel bytes: exact, so the driver gate can
       hash it without float-summation caveats
    -> fake audio features: (item_id, sample_rate, n_samples, rms)
    -> real audio features: (item_id, sample_rate, n_samples, amp, rms)
       — amp is max |sample| normalized by a power of two: exact
    -> frame samples:  (item_id, frame_idx, frame: binary) via flat_map

Large-binary batch sizing: callers pass small ``batch_size`` (payload
bytes x batch_size x concurrency must fit the worker heap —
SURVEY.md §7 hard part 6); the stages never hold more than one batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("mean_luma", pa.float64()),
])

AUDIO_FEATURE_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
    ("rms", pa.float64()),
])

IMAGE_REAL_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("mean_luma", pa.float64()),
    ("luma_sum", pa.int64()),
])

AUDIO_REAL_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
    ("amp", pa.float64()),
    ("rms", pa.float64()),
])


def _fake_image_meta(payload: bytes) -> tuple[int, int, int, float]:
    d = hashlib.md5(payload).digest()
    width = 16 + (int.from_bytes(d[0:2], "little") % 2032)
    height = 16 + (int.from_bytes(d[2:4], "little") % 2032)
    channels = 1 + (d[4] % 4)
    mean_luma = round(d[5] / 255.0, 6)
    return width, height, channels, mean_luma


def _fake_audio_meta(payload: bytes) -> tuple[int, int, float]:
    d = hashlib.md5(payload).digest()
    sample_rate = (8000, 16000, 22050, 44100, 48000)[d[0] % 5]
    n_samples = len(payload) * 4
    rms = round(d[1] / 255.0, 6)
    return sample_rate, n_samples, rms


class ImageDecode:
    """Actor-pool batch fn: (item_id, payload) -> image features.

    ``__init__`` holds the decoder (once per actor); ``__call__`` is the
    per-batch hot path.  ``codec="real"`` decodes PNG/BMP with the
    stdlib codec module and other formats with Pillow when importable;
    ``codec="fake"`` is the md5-arithmetic oracle."""

    def __init__(self, codec: str = "fake"):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec: {codec!r}")
        self.codec = codec
        if codec == "real":
            from ..functions import codecs

            self.codecs = codecs
            try:  # optional JPEG/WebP fallback — absent in this container
                from PIL import Image

                self.pil = Image
            except ImportError:
                self.pil = None

    def _decode_real(self, payload: bytes) -> np.ndarray:
        c = self.codecs
        mime = c.sniff_mime(payload)
        if mime == "image/png":
            return c.decode_png(payload)
        if mime == "image/bmp":
            return c.decode_bmp(payload)
        if self.pil is not None:
            import io

            arr = np.asarray(self.pil.open(io.BytesIO(payload)))
            return arr if arr.ndim == 3 else arr[:, :, None]
        raise c.UnsupportedMediaError(
            f"container {mime or 'unknown'}: stdlib codecs cover "
            "PNG/BMP; install Pillow for other formats")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        if self.codec == "fake":
            rows = [(i, *_fake_image_meta(p)) for i, p in zip(ids, payloads)]
            cols = list(zip(*rows)) if rows else [[]] * 5
            return pa.table({
                "item_id": pa.array(cols[0], pa.int64()),
                "width": pa.array(cols[1], pa.int32()),
                "height": pa.array(cols[2], pa.int32()),
                "channels": pa.array(cols[3], pa.int32()),
                "mean_luma": pa.array(cols[4], pa.float64()),
            }, schema=IMAGE_FEATURE_SCHEMA)
        out = {k: [] for k in ("item_id", "width", "height", "channels",
                               "mean_luma", "luma_sum")}
        for i, p in zip(ids, payloads):
            arr = self._decode_real(p)
            h, w, ch = arr.shape
            luma_sum = int(arr.sum(dtype=np.int64))
            out["item_id"].append(i)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            # exact integer sum first; the two IEEE divisions are then
            # bit-reproducible across engines
            out["mean_luma"].append(luma_sum / (w * h * ch) / 255.0)
            out["luma_sum"].append(luma_sum)
        return pa.table(out, schema=IMAGE_REAL_SCHEMA)


class AudioDecode:
    """Actor-pool batch fn: (item_id, payload) -> audio features.
    ``codec="real"`` decodes integer-PCM WAV via the stdlib ``wave``
    module; ``codec="fake"`` is the md5-arithmetic oracle."""

    def __init__(self, codec: str = "fake"):
        if codec not in ("fake", "real"):
            raise ValueError(f"unknown codec: {codec!r}")
        self.codec = codec
        if codec == "real":
            from ..functions import codecs

            self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        if self.codec == "fake":
            rows = [(i, *_fake_audio_meta(p)) for i, p in zip(ids, payloads)]
            cols = list(zip(*rows)) if rows else [[]] * 4
            return pa.table({
                "item_id": pa.array(cols[0], pa.int64()),
                "sample_rate": pa.array(cols[1], pa.int32()),
                "n_samples": pa.array(cols[2], pa.int64()),
                "rms": pa.array(cols[3], pa.float64()),
            }, schema=AUDIO_FEATURE_SCHEMA)
        out = {k: [] for k in ("item_id", "sample_rate", "n_samples",
                               "amp", "rms")}
        for i, p in zip(ids, payloads):
            rate, samples = self.codecs.decode_wav(p)
            out["item_id"].append(i)
            out["sample_rate"].append(rate)
            out["n_samples"].append(samples.shape[0])
            # max|sample| is a power-of-two-normalized int: exact
            out["amp"].append(float(np.abs(samples).max())
                              if samples.size else 0.0)
            out["rms"].append(float(np.sqrt(np.mean(samples ** 2)))
                              if samples.size else 0.0)
        return pa.table(out, schema=AUDIO_REAL_SCHEMA)


def sample_frames(row: dict, every_n_bytes: int = 4096,
                  max_frames: int = 8) -> list[dict]:
    """One media row -> up to ``max_frames`` frame rows.

    The fake 'frame' is the byte window at each sample point; a real
    video path replaces the windowing with pyav keyframe extraction —
    the fan-out shape (one row in, N small rows out, payload column
    dropped) is what matters for the pipeline."""
    payload = row["payload"]
    out = []
    for frame_idx, start in enumerate(
            range(0, len(payload), every_n_bytes)):
        if frame_idx >= max_frames:
            break
        out.append({
            "item_id": row["item_id"],
            "frame_idx": frame_idx,
            "frame": payload[start : start + 256],
        })
    return out


def _sample_frames_batch(batch: pa.Table, every_n_bytes: int,
                         max_frames: int) -> pa.Table:
    """Batched fan-out (``flat_map`` would invoke Python per ROW)."""
    ids, idxs, frames = [], [], []
    for item_id, payload in zip(batch["item_id"].to_pylist(),
                                batch["payload"].to_pylist()):
        for row in sample_frames(
                {"item_id": item_id, "payload": payload},
                every_n_bytes, max_frames):
            ids.append(row["item_id"])
            idxs.append(row["frame_idx"])
            frames.append(row["frame"])
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "frame_idx": pa.array(idxs, pa.int32()),
        "frame": pa.array(frames, pa.binary()),
    })


def image_features(ds, concurrency=2, batch_size: int = 64,
                   codec: str = "fake"):
    """media -> image feature table (actor pool; small batches because
    payloads are wide)."""
    return ds.map_batches(
        ImageDecode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"codec": codec},
    )


def audio_features(ds, concurrency=2, batch_size: int = 64,
                   codec: str = "fake"):
    return ds.map_batches(
        AudioDecode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"codec": codec},
    )


def frame_samples(ds, every_n_bytes: int = 4096, max_frames: int = 8,
                  batch_size: int = 64):
    return ds.map_batches(
        _sample_frames_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        fn_kwargs={"every_n_bytes": every_n_bytes,
                   "max_frames": max_frames},
    )
