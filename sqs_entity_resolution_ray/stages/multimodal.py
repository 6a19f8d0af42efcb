"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns alongside (media_type, width/height or sample_rate, ...). The
Ray-side plumbing — schemas, small batch sizes for wide rows, actor-pool
stages with per-actor codec init, deterministic output layout — is real
and tested.

Codec resolution (probed ONCE per actor in ``__init__``):

1. an injected ``decoder`` callable (``backend="custom"``) — how tests
   exercise the real branch without the libraries installed;
2. the library backend (PIL / soundfile) when importable;
3. a clearly-marked deterministic fake keyed on payload bytes (or
   ``NotImplementedError`` under ``strict=True``) — the sandbox fallback,
   since no image/audio libraries exist in this environment.

The real branches (2) share all their post-decode math with (1): decode →
pixel/sample array → vectorized numpy feature reduction. Only the
bytes→array step differs per backend.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),   # image/png, audio/wav, video/mp4 …
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

# Wide binary rows: keep batches small so batch × concurrency fits the
# worker heap (SURVEY "memory-aware"); callers pass batch_size≈32-256.
DEFAULT_MEDIA_BATCH = 64


def _fake_features(payloads: list[bytes], dim: int) -> np.ndarray:
    """Deterministic stand-in features: seeded from the payload sha256."""
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        seed = int.from_bytes(hashlib.sha256(p or b"").digest()[:8], "big")
        out[i] = np.random.default_rng(seed).standard_normal(dim)
    return out


def _mean_pool_resize(pixels: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Resize an (H, W[, C]) array to target (tw, th) by block-mean pooling.

    Vectorized: bucket rows/cols into target bins with integer index maps
    (nearest-bin gather + reduceat-free mean via np.add.at is overkill for
    a per-image op; a strided gather is exact enough for features and O(hw)).
    """
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    tw, th = target
    row_idx = np.minimum((np.arange(th) * h) // th, h - 1)
    col_idx = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return pixels[row_idx][:, col_idx].astype(np.float32)


def _image_feature_vec(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Decoded pixels → fixed-size feature vector (grayscale bin means)."""
    gray = _mean_pool_resize(pixels, (dim, 1)).mean(axis=(0, 2))
    return (gray / 255.0).astype(np.float32)


def _audio_feature_vec(samples: np.ndarray, dim: int) -> np.ndarray:
    """Decoded samples → per-window RMS energy over ``dim`` windows."""
    samples = np.asarray(samples, dtype=np.float32).ravel()
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    n = (samples.size // dim) * dim
    if n == 0:  # fewer samples than windows: pad
        samples = np.pad(samples, (0, dim - samples.size))
        n = dim
    windows = samples[:n].reshape(dim, -1)
    return np.sqrt((windows ** 2).mean(axis=1)).astype(np.float32)


class ImageDecodeStage:
    """Actor stage: decode + resize + feature-extract an image column.

    ``decoder`` (payload-bytes → (H, W[, C]) uint8 array) forces the real
    branch; otherwise PIL is probed once per actor; otherwise the
    deterministic fake runs (sandbox fallback).
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224),
                 feature_dim: int = 64, strict: bool = False,
                 decoder: Optional[Callable[[bytes], np.ndarray]] = None):
        self.target = target_size
        self.dim = feature_dim
        if decoder is not None:
            self.backend = "custom"
            self._decode = decoder
            return
        try:  # pragma: no cover - library not present in this environment
            from PIL import Image

            def _pil_decode(payload: bytes) -> np.ndarray:
                import io

                return np.asarray(
                    Image.open(io.BytesIO(payload)).convert("RGB"),
                    dtype=np.uint8,
                )

            self.backend = "pil"
            self._decode = _pil_decode
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decoding requires PIL; not available in this "
                    "environment (stubbed per project constraints)"
                )
            self.backend = "fake"
            self._decode = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.backend == "fake":
            feats = _fake_features(payloads, self.dim)
            sizes = np.full((len(payloads), 2), self.target, dtype=np.int32)
        else:
            feats = np.empty((len(payloads), self.dim), dtype=np.float32)
            sizes = np.empty((len(payloads), 2), dtype=np.int32)
            for i, p in enumerate(payloads):
                pixels = self._decode(p)
                resized = _mean_pool_resize(pixels, self.target)
                feats[i] = _image_feature_vec(resized, self.dim)
                sizes[i] = (pixels.shape[1], pixels.shape[0])  # (w, h) source
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "backend": pa.array([self.backend] * len(payloads), pa.string()),
                "width": pa.array(sizes[:, 0], pa.int32()),
                "height": pa.array(sizes[:, 1], pa.int32()),
                "features": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float32())
                ),
            }
        )


class AudioFeatureStage:
    """Actor stage: audio → fixed-size feature vector.

    ``decoder`` (payload-bytes → (samples float32 array, sample_rate))
    forces the real branch; otherwise soundfile is probed; otherwise the
    deterministic fake runs.
    """

    def __init__(self, feature_dim: int = 32, strict: bool = False,
                 decoder: Optional[Callable[[bytes], tuple]] = None):
        self.dim = feature_dim
        if decoder is not None:
            self.backend = "custom"
            self._decode = decoder
            return
        try:  # pragma: no cover
            import soundfile

            def _sf_decode(payload: bytes) -> tuple:
                import io

                samples, rate = soundfile.read(io.BytesIO(payload))
                return np.asarray(samples, dtype=np.float32), int(rate)

            self.backend = "soundfile"
            self._decode = _sf_decode
        except ImportError:
            if strict:
                raise NotImplementedError("audio decoding requires soundfile")
            self.backend = "fake"
            self._decode = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.backend == "fake":
            feats = _fake_features(payloads, self.dim)
            rates = np.zeros(len(payloads), dtype=np.int32)
        else:
            feats = np.empty((len(payloads), self.dim), dtype=np.float32)
            rates = np.empty(len(payloads), dtype=np.int32)
            for i, p in enumerate(payloads):
                samples, rate = self._decode(p)
                feats[i] = _audio_feature_vec(samples, self.dim)
                rates[i] = rate
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "backend": pa.array([self.backend] * len(payloads), pa.string()),
                "sample_rate": pa.array(rates, pa.int32()),
                "features": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Actor stage: video → n uniformly-sampled frame payloads.

    ``decoder`` (payload-bytes → list of frame byte-strings) forces the
    real branch (e.g. an ffmpeg/imageio wrapper on a real cluster);
    sandbox fallback emits deterministic fake frames.
    """

    def __init__(self, n_frames: int = 4, strict: bool = False,
                 decoder: Optional[Callable[[bytes], list]] = None):
        self.n = n_frames
        if decoder is not None:
            self.backend = "custom"
            self._decode = decoder
            return
        if strict:
            raise NotImplementedError("video decoding not available here")
        self.backend = "fake"
        self._decode = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if self.backend == "fake":
                sampled = [
                    hashlib.sha256((payload or b"") + bytes([f])).digest()
                    for f in range(self.n)
                ]
            else:
                all_frames = self._decode(payload)
                if len(all_frames) <= self.n:
                    sampled = list(all_frames)
                else:  # uniform temporal sampling
                    pick = (np.arange(self.n) * len(all_frames)) // self.n
                    sampled = [all_frames[j] for j in pick]
            for f, fr in enumerate(sampled):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )


def decode_images(media: rd.Dataset, concurrency: int = 2,
                  batch_size: int = DEFAULT_MEDIA_BATCH, **kwargs) -> rd.Dataset:
    return media.map_batches(
        ImageDecodeStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def audio_features(media: rd.Dataset, concurrency: int = 2,
                   batch_size: int = DEFAULT_MEDIA_BATCH, **kwargs) -> rd.Dataset:
    return media.map_batches(
        AudioFeatureStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(media: rd.Dataset, concurrency: int = 2,
                  batch_size: int = DEFAULT_MEDIA_BATCH, **kwargs) -> rd.Dataset:
    return media.map_batches(
        FrameSampleStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def synthetic_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_id": [f"m{i:05d}" for i in range(n)],
        "media_type": [("image/png", "audio/wav", "video/mp4")[i % 3]
                       for i in range(n)],
        "payload": [rng.bytes(256 + (i % 7) * 64) for i in range(n)],
        "meta_width": [640] * n,
        "meta_height": [480] * n,
        "meta_duration_ms": [1000 + 100 * (i % 10) for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
