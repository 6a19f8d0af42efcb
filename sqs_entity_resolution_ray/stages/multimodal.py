"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with metadata
columns alongside (media_type, width/height or sample_rate, ...). The
Ray-side plumbing — schemas, small batch sizes for wide rows, actor-pool
stages with per-actor codec init, deterministic output layout — is real
and tested; the codec itself is STUBBED because no image/audio libraries
exist in this environment: each stage tries its real backend at actor
init and otherwise uses a clearly-marked deterministic fake (or raises
``NotImplementedError`` under strict=True).
"""

from __future__ import annotations

import hashlib

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


class ImageDecodeStage:
    """Actor stage: decode + resize + feature-extract an image column.

    Real backend (PIL) is probed ONCE per actor in ``__init__``; absent
    here, so the decode is a deterministic fake keyed on payload bytes.
    Output schema is the real one either way.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224),
                 feature_dim: int = 64, strict: bool = False):
        self.target = target_size
        self.dim = feature_dim
        try:  # pragma: no cover - library not present in this environment
            from PIL import Image  # noqa: F401

            self.backend = "pil"
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decoding requires PIL; not available in this "
                    "environment (stubbed per project constraints)"
                )
            self.backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = _fake_features(payloads, self.dim)  # backend=="pil" would decode
        sizes = np.full((len(payloads), 2), self.target, dtype=np.int32)
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
    """Actor stage: audio → fixed-size feature vector (stubbed codec)."""

    def __init__(self, feature_dim: int = 32, strict: bool = False):
        self.dim = feature_dim
        try:  # pragma: no cover
            import soundfile  # noqa: F401

            self.backend = "soundfile"
        except ImportError:
            if strict:
                raise NotImplementedError("audio decoding requires soundfile")
            self.backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = _fake_features(payloads, self.dim)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "backend": pa.array([self.backend] * len(payloads), pa.string()),
                "features": pa.array(
                    [row.tolist() for row in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Actor stage: video → n deterministic frame payloads (stubbed)."""

    def __init__(self, n_frames: int = 4, strict: bool = False):
        self.n = n_frames
        if strict:
            raise NotImplementedError("video decoding not available here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta_duration_ms").to_pylist(),
        ):
            for f in range(self.n):
                ids.append(mid)
                frame_idx.append(f)
                # deterministic fake frame: slice of payload hash
                h = hashlib.sha256((payload or b"") + bytes([f])).digest()
                frames.append(h)
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
