"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The actual codec libraries (Pillow, ffmpeg,
torchaudio, ...) are NOT in this container, so the codec call itself is
stubbed: with ``fake=True`` (the default here) a deterministic fake
decoder derived from the payload bytes stands in, keeping every
Ray-facing part — schema, batch sizing, actor signature, output layout —
real and testable; with ``fake=False`` the stages raise
``NotImplementedError`` at the exact call site a codec would occupy.

Batch-size guidance: media payloads are KB..MB wide — run these stages
with a small ``batch_size`` (e.g. 64) and ``batch_format="pyarrow"`` so
binary columns never round-trip through pandas object dtype.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _fake_dims(payload: bytes) -> tuple[int, int]:
    # md5 digest bytes 0/1: for ASCII-text payloads this equals DuckDB's
    # md5_number_upper(s) & 255 / >> 8 & 255, so the fake decode has an
    # exact SQL oracle (md5_number_upper = first 8 digest bytes, LE)
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 64, 64 + h[1] % 64  # (width, height)


class ImageDecoder:
    """binary image -> (width, height, n_pixels, mean_luma) metadata.

    Real implementation would call e.g. PIL.Image.open at the marked
    site; schema and actor shape are identical.
    """

    def __init__(self, data_col: str = "image", fake: bool = True) -> None:
        self.data_col = data_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.data_col).to_pylist()
        w, h, lum = [], [], []
        for p in payloads:
            if not self.fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "install Pillow and decode here"
                )
            fw, fh = _fake_dims(p or b"")
            w.append(fw)
            h.append(fh)
            lum.append((sum(p[:64]) / max(1, len(p[:64]))) / 255.0 if p else 0.0)
        return (
            batch.append_column("width", pa.array(w, pa.int32()))
            .append_column("height", pa.array(h, pa.int32()))
            .append_column("n_pixels", pa.array([a * b for a, b in zip(w, h)], pa.int64()))
            .append_column("mean_luma", pa.array(np.round(lum, 6), pa.float64()))
        )


class ImageResizer:
    """binary image -> binary thumbnail + new dims.  Fake mode emits a
    deterministic hash-payload of the requested size marker."""

    def __init__(self, data_col: str = "image", target: tuple[int, int] = (32, 32), fake: bool = True) -> None:
        self.data_col = data_col
        self.target = target
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        tw, th = self.target
        for p in batch.column(self.data_col).to_pylist():
            if not self.fake:
                raise NotImplementedError("image resize codec not available")
            dims = tw.to_bytes(2, "little") + th.to_bytes(2, "little")
            out.append(hashlib.blake2b((p or b"") + dims, digest_size=32).digest())
        return (
            batch.append_column("thumb", pa.array(out, pa.binary()))
            .append_column("thumb_w", pa.array([tw] * batch.num_rows, pa.int32()))
            .append_column("thumb_h", pa.array([th] * batch.num_rows, pa.int32()))
        )


class AudioFeaturizer:
    """binary audio -> (duration_sec, n_frames, energy) metadata stub."""

    def __init__(self, data_col: str = "audio", sample_rate: int = 16000, fake: bool = True) -> None:
        self.data_col = data_col
        self.sample_rate = sample_rate
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, nf, en = [], [], []
        for p in batch.column(self.data_col).to_pylist():
            if not self.fake:
                raise NotImplementedError("audio codec not available")
            n = len(p or b"") // 2  # pretend s16le mono
            # no rounding: Python round() (binary half-even) and DuckDB
            # round() (decimal half-away) diverge on ties — the raw IEEE
            # quotients are deterministic and identical on both sides
            dur.append(n / self.sample_rate)
            nf.append(n)
            en.append((sum((p or b"")[:256]) / max(1, len((p or b"")[:256]))) / 255.0)
        return (
            batch.append_column("duration_sec", pa.array(dur, pa.float64()))
            .append_column("n_frames", pa.array(nf, pa.int64()))
            .append_column("energy", pa.array(en, pa.float64()))
        )


class VideoFrameSampler:
    """binary video -> list<binary> of N sampled "frames" (fake: slices)."""

    def __init__(self, data_col: str = "video", n_frames: int = 4, fake: bool = True) -> None:
        self.data_col = data_col
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = []
        for p in batch.column(self.data_col).to_pylist():
            if not self.fake:
                raise NotImplementedError("video codec not available")
            p = p or b""
            step = max(1, len(p) // self.n_frames)
            frames.append([p[i * step : i * step + 16] for i in range(self.n_frames)])
        return batch.append_column("frames", pa.array(frames, pa.list_(pa.binary())))
