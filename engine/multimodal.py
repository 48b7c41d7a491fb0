"""Multimodal columns: opaque ``binary`` payloads + typed metadata, processed
by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE KERNELS are stubbed:
``ImageDecoder`` tries Pillow at actor init and, when absent, substitutes a
deterministic fake decode (pixel tensor derived from the payload hash) —
clearly marked, swap-in ready. Everything AROUND the decode is real and
tested: schema handling, small-batch sizing for large payloads, actor-pool
signatures, fixed-shape tensor output layout.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synth_media_table(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake media payloads for pipeline tests."""
    payloads, mimes, ws, hs = [], [], [], []
    for r in refs:
        h = hashlib.sha256(f"{seed}:{r}".encode()).digest()
        payloads.append(h * 32)  # 1 KiB opaque blob
        mimes.append("image/png" if h[0] % 2 == 0 else "image/jpeg")
        ws.append(64 + h[1] % 64)
        hs.append(64 + h[2] % 64)
    return pa.table({"media_ref": refs, "payload": payloads, "mime": mimes,
                     "width": pa.array(ws, pa.int32()),
                     "height": pa.array(hs, pa.int32())})


class ImageDecoder:
    """Actor-pool stage: decode payloads -> fixed-shape float32 tensors.

    Real path: Pillow (if importable) decodes and resizes to
    ``(target, target, 3)``. STUB path (this container): deterministic fake
    pixels from the payload hash — same shapes, same dtypes, same layout, so
    the Ray-side plumbing is fully exercised.
    """

    def __init__(self, target: int = 32):
        self.target = target
        try:  # pragma: no cover - Pillow absent in this container
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self._pil is not None:  # pragma: no cover
            import io
            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.target, self.target))
            return np.asarray(img, dtype=np.float32) / 255.0
        # STUB decode: deterministic pseudo-pixels from the payload digest
        dig = hashlib.sha256(payload + bytes([w % 256, h % 256])).digest()
        rng = np.random.default_rng(np.frombuffer(dig[:8], dtype=np.uint64))
        return rng.random((self.target, self.target, 3), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> dict:
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        pixels = np.stack([
            self._decode_one(p or b"", w or 0, h or 0)
            for p, w, h in zip(payloads, ws, hs)])
        return {
            "media_ref": batch.column("media_ref").to_numpy(
                zero_copy_only=False),
            "pixels": pixels,  # (n, target, target, 3) float32 tensor column
        }


class ImageFeatures:
    """Actor-pool stage: tensors -> small feature vectors (channel means/stds
    + 2x2 pooled grid). Pure numpy — real, not stubbed."""

    def __call__(self, batch: dict) -> dict:
        px = batch["pixels"]  # (n, t, t, 3)
        n = px.shape[0]
        means = px.mean(axis=(1, 2))
        stds = px.std(axis=(1, 2))
        t = px.shape[1]
        half = t // 2
        pooled = np.stack([
            px[:, :half, :half].mean(axis=(1, 2, 3)),
            px[:, :half, half:].mean(axis=(1, 2, 3)),
            px[:, half:, :half].mean(axis=(1, 2, 3)),
            px[:, half:, half:].mean(axis=(1, 2, 3)),
        ], axis=1)
        feats = np.concatenate([means, stds, pooled], axis=1)
        return {"media_ref": batch["media_ref"],
                "features": feats.astype(np.float32)}


class FrameSampler:
    """Actor-pool stage for video-like payloads: deterministic frame index
    sampling (every_n or uniform k). The decode itself is the stub above;
    the sampling math and output layout are real."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        # fake per-payload frame counts derived from payload size
        counts = [max(1, len(p or b"") // 256) for p in payloads]
        sampled = []
        for c in counts:
            k = min(self.n_frames, c)
            idx = np.linspace(0, c - 1, k).astype(np.int32)
            sampled.append(idx.tolist())
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "n_frames": pa.array(counts, pa.int32()),
            "frame_indices": pa.array(sampled, pa.list_(pa.int32())),
        })


def decode_and_featurize(media_ds, *, target: int = 32,
                         batch_size: int = 64, concurrency=(1, 4)):
    """Two actor-pool stages; small batch_size because payloads are large
    binaries (batch x concurrency must fit worker heaps)."""
    decoded = media_ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return decoded.map_batches(
        ImageFeatures, batch_format="numpy", batch_size=batch_size,
        concurrency=concurrency)


class AudioDecoder:
    """Actor-pool stage: audio payloads -> fixed-length float32 PCM frames.

    Real path: ``soundfile`` if importable (absent in this container).
    STUB path: deterministic fake PCM derived from the payload hash — same
    shape/dtype/layout, so batch sizing and the downstream feature stage
    are fully exercised.
    """

    def __init__(self, n_samples: int = 4096):
        self.n_samples = n_samples
        try:  # pragma: no cover - soundfile absent in this container
            import soundfile  # noqa: F401
            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self._sf is not None:  # pragma: no cover
            import io
            data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
            if data.ndim > 1:
                data = data.mean(axis=1)
            out = np.zeros(self.n_samples, dtype=np.float32)
            out[:min(len(data), self.n_samples)] = \
                data[:self.n_samples]
            return out
        dig = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(np.frombuffer(dig[:8], dtype=np.uint64))
        return (rng.random(self.n_samples, dtype=np.float32) * 2.0) - 1.0

    def __call__(self, batch: pa.Table) -> dict:
        payloads = batch.column("payload").to_pylist()
        pcm = np.stack([self._decode_one(p or b"") for p in payloads])
        return {"media_ref": batch.column("media_ref").to_numpy(
            zero_copy_only=False), "pcm": pcm}


class AudioFeatures:
    """PCM -> (rms, zero-crossing rate, spectral centroid, rolloff). Pure
    numpy (rfft) — real, not stubbed."""

    def __call__(self, batch: dict) -> dict:
        pcm = batch["pcm"]  # (n, samples) float32
        rms = np.sqrt((pcm ** 2).mean(axis=1))
        zcr = (np.diff(np.signbit(pcm), axis=1) != 0).mean(axis=1)
        spec = np.abs(np.fft.rfft(pcm, axis=1))
        freqs = np.arange(spec.shape[1], dtype=np.float64)
        power = spec ** 2
        total = power.sum(axis=1)
        total[total == 0] = 1.0
        centroid = (power * freqs).sum(axis=1) / total
        cum = np.cumsum(power, axis=1)
        roll = (cum >= 0.85 * total[:, None]).argmax(axis=1)
        feats = np.stack([rms, zcr, centroid, roll], axis=1)
        return {"media_ref": batch["media_ref"],
                "audio_features": feats.astype(np.float32)}


def audio_features(media_ds, *, n_samples: int = 4096,
                   batch_size: int = 64, concurrency=(1, 4)):
    """Decode + featurize audio payloads (two actor-pool stages; small
    batches because payloads are large binaries)."""
    decoded = media_ds.map_batches(
        AudioDecoder, fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return decoded.map_batches(
        AudioFeatures, batch_format="numpy", batch_size=batch_size,
        concurrency=concurrency)
