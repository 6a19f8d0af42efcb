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


# ------------------------------------------------------- builtin codecs --
# Pure-Python/stdlib decoders for container formats that need no external
# codec library: uncompressed 24-bit BMP (struct + numpy), non-interlaced
# 8-bit PNG (stdlib ``zlib`` inflate + unfilter) and PCM WAV (stdlib
# ``wave``). These give the decode stages REAL, pytest-covered
# bytes→array branches — including a compressed format — in environments
# without PIL/soundfile; JPEG/FLAC/MP4 still require library backends.


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 RGB array.

    Parses the BITMAPFILEHEADER/BITMAPINFOHEADER layout directly
    (bottom-up rows, 4-byte row padding, BGR channel order).
    """
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, np.uint8, count=row_size * h, offset=pix_off)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # stored BGR
    return (rgb[::-1] if bottom_up else rgb).copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP bytes (the inverse
    of :func:`decode_bmp`; used by tests and synthetic fixtures)."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    body = np.zeros((h, row_size), dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    data = body.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    )
    assert pad >= 0
    return header + data


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG → (H, W, 3) uint8 RGB array, pure stdlib
    (zlib inflate + chunk walk + per-row unfilter) — a REAL
    compressed-format decode branch with no codec library.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA); alpha is dropped, gray replicates to RGB. The Up and Sub
    filters unfilter vectorized (Sub is a per-channel cumsum mod 256);
    Average/Paeth fall back to a per-pixel walk along the row.
    """
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)  # headroom for unfilter sums
    recon = np.zeros((h, stride), dtype=np.int64)
    bpp = channels
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        up = recon[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            recon[y] = cur
        elif f == 1:  # Sub: per-channel cumsum mod 256
            recon[y] = (np.cumsum(cur.reshape(-1, bpp), axis=0) % 256).reshape(-1)
        elif f == 2:  # Up
            recon[y] = (cur + up) % 256
        elif f == 3:  # Average
            row = recon[y]
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (cur[x] + (left + up[x]) // 2) % 256
        elif f == 4:  # Paeth
            row = recon[y]
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = up[x]
                c = up[x - bpp] if x >= bpp else 0
                pp = a + b - c
                pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                    b if pb_ <= pc_ else c)
                row[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
    px = recon.astype(np.uint8).reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → non-interlaced PNG bytes (pure stdlib; the
    inverse of :func:`decode_png` — used by tests and fixtures).
    ``filter_type`` 0 (None), 1 (Sub) or 2 (Up) per row."""
    import struct
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, c = px.shape
    assert c == 3 and filter_type in (0, 1, 2)
    flat = px.reshape(h, w * c).astype(np.int64)
    if filter_type == 0:
        body_rows = flat % 256
    elif filter_type == 1:  # Sub
        shifted = np.zeros_like(flat)
        shifted[:, c:] = flat[:, :-c]
        body_rows = (flat - shifted) % 256
    else:  # Up
        shifted = np.zeros_like(flat)
        shifted[1:] = flat[:-1]
        body_rows = (flat - shifted) % 256
    raw = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8),
         body_rows.astype(np.uint8)], axis=1).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float32 samples in [-1, 1], sample_rate) via the
    stdlib ``wave`` module (no external codec)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] → 16-bit PCM mono WAV bytes."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


_WAV_MAGIC = (b"RIFF", b"WAVE")


def _is_bmp(payload: bytes) -> bool:
    return bool(payload) and payload[:2] == b"BM"


def _is_png(payload: bytes) -> bool:
    return bool(payload) and payload[:8] == b"\x89PNG\r\n\x1a\n"


def _is_wav(payload: bytes) -> bool:
    return bool(payload) and payload[:4] == _WAV_MAGIC[0] and \
        payload[8:12] == _WAV_MAGIC[1]


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
            # builtin fallback: REAL pure-Python decode for uncompressed
            # BMP payloads (decode_bmp — no codec library needed); other
            # formats fall to the deterministic fake (or raise under
            # strict=True). Per-row ``backend`` labels say which ran.
            self.backend = "builtin"
            self.strict = strict
            self._decode = decode_bmp

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        labels = [self.backend] * n
        if self.backend == "fake":
            feats = _fake_features(payloads, self.dim)
            sizes = np.full((n, 2), self.target, dtype=np.int32)
        else:
            feats = np.empty((n, self.dim), dtype=np.float32)
            sizes = np.empty((n, 2), dtype=np.int32)
            for i, p in enumerate(payloads):
                if self.backend == "builtin":
                    if _is_bmp(p):
                        labels[i] = "bmp"
                        self._decode = decode_bmp
                    elif _is_png(p):
                        labels[i] = "png"
                        self._decode = decode_png
                    elif getattr(self, "strict", False):
                        raise NotImplementedError(
                            "non-BMP/PNG image decoding requires PIL; not "
                            "available in this environment"
                        )
                    else:  # no builtin codec for this format: fake row
                        labels[i] = "fake"
                        feats[i] = _fake_features([p], self.dim)[0]
                        sizes[i] = self.target
                        continue
                pixels = self._decode(p)
                resized = _mean_pool_resize(pixels, self.target)
                feats[i] = _image_feature_vec(resized, self.dim)
                sizes[i] = (pixels.shape[1], pixels.shape[0])  # (w, h) source
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "backend": pa.array(labels, pa.string()),
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
            # builtin fallback: REAL stdlib decode for PCM WAV payloads
            # (decode_wav); other formats fall to the deterministic fake
            # (or raise under strict=True).
            self.backend = "builtin"
            self.strict = strict
            self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        labels = [self.backend] * n
        if self.backend == "fake":
            feats = _fake_features(payloads, self.dim)
            rates = np.zeros(n, dtype=np.int32)
        else:
            feats = np.empty((n, self.dim), dtype=np.float32)
            rates = np.empty(n, dtype=np.int32)
            for i, p in enumerate(payloads):
                if self.backend == "builtin":
                    if _is_wav(p):
                        labels[i] = "wav"
                    elif getattr(self, "strict", False):
                        raise NotImplementedError(
                            "non-WAV audio decoding requires soundfile; "
                            "not available in this environment"
                        )
                    else:
                        labels[i] = "fake"
                        feats[i] = _fake_features([p], self.dim)[0]
                        rates[i] = 0
                        continue
                samples, rate = self._decode(p)
                feats[i] = _audio_feature_vec(samples, self.dim)
                rates[i] = rate
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "backend": pa.array(labels, pa.string()),
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


def synthetic_media(n: int = 64, seed: int = 42,
                    real_payloads: bool = False) -> pa.Table:
    """Deterministic media table matching MEDIA_SCHEMA (for tests).

    ``real_payloads=True`` emits genuine container bytes — uncompressed
    BMP images and PCM WAV audio (via :func:`encode_bmp` /
    :func:`encode_wav`) — so the decode stages exercise their REAL
    builtin decode branch without any codec library; False keeps the
    legacy opaque random bytes (every row decodes via the fake branch).
    """
    rng = np.random.default_rng(seed)
    payloads: list[bytes] = []
    types: list[str] = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            if real_payloads:
                w, h = 16 + (i % 5) * 8, 12 + (i % 3) * 8
                px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                if (i // 3) % 2:  # alternate the two builtin codecs
                    types.append("image/png")
                    payloads.append(encode_png(px, filter_type=(i // 6) % 3))
                else:
                    types.append("image/bmp")
                    payloads.append(encode_bmp(px))
            else:
                types.append("image/png")
                payloads.append(rng.bytes(256 + (i % 7) * 64))
        elif kind == 1:
            types.append("audio/wav")
            if real_payloads:
                t = np.arange(800 + 160 * (i % 5)) / 16000.0
                payloads.append(encode_wav(
                    np.sin(2 * np.pi * (220 + 20 * i) * t) * 0.5))
            else:
                payloads.append(rng.bytes(256 + (i % 7) * 64))
        else:
            types.append("video/mp4")
            payloads.append(rng.bytes(256 + (i % 7) * 64))
    rows = {
        "media_id": [f"m{i:05d}" for i in range(n)],
        "media_type": types,
        "payload": payloads,
        "meta_width": [640] * n,
        "meta_height": [480] * n,
        "meta_duration_ms": [1000 + 100 * (i % 10) for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
