"""Multimodal (image/audio/video) stages: opaque binary columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed behind an import-try: when absent, a
clearly-marked deterministic fake produces stable pseudo-features from the
payload bytes, keeping the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) real and tested. At deploy time, swapping the
kernel body is the only change.

Batch-size note (100 TB): binary payloads dominate block size — callers
should pass small ``batch_size`` (e.g. 32-128) and keep
``batch_format="pyarrow"`` so payload bytes stay zero-copy in the object
store until the decode touches them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.large_binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def _fake_features(payload: bytes, dim: int, salt: bytes) -> np.ndarray:
    """Deterministic pseudo-features: blake2b(payload) expanded to `dim`
    floats in [0,1). Stands in for a real model forward pass."""
    out = np.empty(dim, dtype=np.float32)
    counter = 0
    filled = 0
    while filled < dim:
        h = hashlib.blake2b(payload, key=salt + counter.to_bytes(4, "little"),
                            digest_size=32).digest()
        vals = np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
        take = min(len(vals), dim - filled)
        out[filled : filled + take] = vals[:take]
        filled += take
        counter += 1
    return out


class ImageDecodeStage:
    """Decode + resize + feature-extract for image payloads.

    Real path (PIL available): decode, resize to ``size``, mean-pool RGB.
    Stub path: deterministic fake features. Actor state (the 'model') is
    built once in ``__init__`` — use
    ``map_batches(ImageDecodeStage, concurrency=N, batch_size=32)``.
    """

    def __init__(self, size: tuple[int, int] = (64, 64), feature_dim: int = 64,
                 payload_col: str = "payload"):
        self.size = size
        self.dim = feature_dim
        self.payload_col = payload_col
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, payload: bytes | None) -> np.ndarray | None:
        if payload is None:
            return None
        if self._pil is not None:  # pragma: no cover
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB").resize(self.size)
            arr = np.asarray(img, dtype=np.float32) / 255.0
            pooled = arr.mean(axis=(0, 1))
            reps = int(np.ceil(self.dim / 3))
            return np.tile(pooled, reps)[: self.dim]
        # STUB: deterministic fake (no image lib in this environment)
        return _fake_features(payload, self.dim, b"img!")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch[self.payload_col].to_pylist()]
        col = pa.array(
            [None if f is None else f.tolist() for f in feats],
            type=pa.list_(pa.float32()),
        )
        return batch.drop_columns([self.payload_col]).append_column("image_features", col)


class AudioFeatureStage:
    """Audio feature extraction (stub: deterministic fake spectrogram stats)."""

    def __init__(self, feature_dim: int = 32, payload_col: str = "payload"):
        self.dim = feature_dim
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            None if p is None else _fake_features(p, self.dim, b"aud!").tolist()
            for p in batch[self.payload_col].to_pylist()
        ]
        col = pa.array(feats, type=pa.list_(pa.float32()))
        return batch.drop_columns([self.payload_col]).append_column("audio_features", col)


class FrameSampleStage:
    """Video frame sampling (stub): emits ``num_frames`` pseudo-frame rows
    per video — a flat_map-shaped expansion done batch-wise."""

    def __init__(self, num_frames: int = 4, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.num_frames = num_frames
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, hashes = [], [], []
        for mid, p in zip(batch[self.id_col].to_pylist(),
                          batch[self.payload_col].to_pylist()):
            if p is None:
                continue
            for f in range(self.num_frames):
                ids.append(mid)
                frames.append(f)
                hashes.append(hashlib.blake2b(p + f.to_bytes(4, "little"),
                                              digest_size=16).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(frames, type=pa.int32()),
                "frame_hash": pa.array(hashes, type=pa.string()),
            }
        )


def synth_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 1024))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(rng.randint(64, 1920, n).astype(np.int32)),
            "height": pa.array(rng.randint(64, 1080, n).astype(np.int32)),
            "duration_ms": pa.array(np.zeros(n, np.int32)),
        }
    )
