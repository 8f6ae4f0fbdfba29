"""Multimodal (image/audio/video) stages: opaque binary columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

Decode support is tiered:

- **Real pure-numpy decoders** for uncompressed container formats — BMP
  (24-bit uncompressed), PPM (P6), and PCM-16 WAV — implemented here with
  no third-party dependency; these run genuine pixel/sample math
  (nearest-neighbour resize, channel pooling, windowed RMS energy).
- **Optional library path**: PIL, if importable, handles compressed image
  formats (absent in this container).
- **Stub fallback** for anything else: a clearly-marked deterministic fake
  produces stable pseudo-features from the payload bytes, keeping the
  Ray-side plumbing (schema, batch sizing, actor signature, output
  layout) real and tested.

Batch-size note (100 TB): binary payloads dominate block size — callers
should pass small ``batch_size`` (e.g. 32-128) and keep
``batch_format="pyarrow"`` so payload bytes stay zero-copy in the object
store until the decode touches them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ------------------------------------------------- real numpy decoders ----


def decode_bmp(data: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB (None if not such a BMP)."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    nrows = abs(h)
    if off + stride * nrows > len(data):
        return None
    arr = np.frombuffer(data, np.uint8, count=stride * nrows, offset=off)
    arr = arr.reshape(nrows, stride)[:, : w * 3].reshape(nrows, w, 3)
    if h > 0:  # positive height = bottom-up row order
        arr = arr[::-1]
    return arr[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit uncompressed BMP bytes (test fixture maker)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    pixels = body.tobytes()
    off = 14 + 40
    size = off + len(pixels)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little") + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + pixels


def decode_ppm(data: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval 255) -> HxWx3 uint8 RGB."""
    if not data.startswith(b"P6"):
        return None
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixels
    parts, i, tok = [], 2, b""
    while len(parts) < 3 and i < len(data):
        c = data[i : i + 1]
        if c.isspace():
            if tok:
                parts.append(int(tok))
                tok = b""
            i += 1
            if len(parts) == 3:
                break
        elif c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        else:
            tok += c
            i += 1
    if len(parts) != 3 or parts[2] != 255:
        return None
    w, h = parts[0], parts[1]
    if i + w * h * 3 > len(data):
        return None
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3).copy()


def decode_wav_pcm16(data: bytes) -> tuple[int, np.ndarray] | None:
    """RIFF/WAVE PCM-16 -> (sample_rate, mono float32 samples in [-1, 1])."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, rate, channels, samples = 12, None, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        sz = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            fmt = int.from_bytes(data[i + 8 : i + 10], "little")
            channels = int.from_bytes(data[i + 10 : i + 12], "little")
            rate = int.from_bytes(data[i + 12 : i + 16], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
            if fmt != 1 or bits != 16:
                return None
        elif cid == b"data":
            raw = data[i + 8 : i + 8 + sz]
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        i += 8 + sz + (sz & 1)
    if rate is None or samples is None or not channels:
        return None
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples


def encode_wav_pcm16(rate: int, samples: np.ndarray) -> bytes:
    """Mono float32 [-1,1] -> PCM-16 WAV bytes (test fixture maker)."""
    pcm = np.clip(samples, -1, 1)
    raw = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + (36 + len(raw)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + b"data" + len(raw).to_bytes(4, "little")
    )
    return hdr + raw


def _resize_nn(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbour resize to (W, H)."""
    w, h = size
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]

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
        # real pure-numpy decode for uncompressed formats
        img = decode_bmp(payload)
        if img is None:
            img = decode_ppm(payload)
        if img is not None:
            arr = _resize_nn(img, self.size).astype(np.float32) / 255.0
            pooled = arr.mean(axis=(0, 1))            # per-channel means
            row_prof = arr.mean(axis=(1, 2))          # vertical profile
            col_prof = arr.mean(axis=(0, 2))          # horizontal profile
            feats = np.concatenate([pooled, row_prof, col_prof])
            reps = int(np.ceil(self.dim / len(feats)))
            return np.tile(feats, reps)[: self.dim].astype(np.float32)
        if self._pil is not None:  # pragma: no cover - PIL absent here
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB").resize(self.size)
            arr = np.asarray(img, dtype=np.float32) / 255.0
            pooled = arr.mean(axis=(0, 1))
            reps = int(np.ceil(self.dim / 3))
            return np.tile(pooled, reps)[: self.dim]
        # STUB: deterministic fake (compressed format, no image lib here)
        return _fake_features(payload, self.dim, b"img!")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) for p in batch[self.payload_col].to_pylist()]
        col = pa.array(
            [None if f is None else f.tolist() for f in feats],
            type=pa.list_(pa.float32()),
        )
        return batch.drop_columns([self.payload_col]).append_column("image_features", col)


class AudioFeatureStage:
    """Audio feature extraction: real windowed-RMS-energy features for
    PCM-16 WAV payloads (pure-numpy decode); deterministic fake for
    compressed codecs (no audio lib in this container)."""

    def __init__(self, feature_dim: int = 32, payload_col: str = "payload"):
        self.dim = feature_dim
        self.payload_col = payload_col

    def _features_one(self, payload: bytes | None) -> list | None:
        if payload is None:
            return None
        wav = decode_wav_pcm16(payload)
        if wav is not None:
            _, samples = wav
            if len(samples) == 0:
                return [0.0] * self.dim
            n = len(samples) // self.dim
            if n == 0:
                pad = np.zeros(self.dim, dtype=np.float32)
                pad[: len(samples)] = np.abs(samples)
                return pad.tolist()
            rms = np.sqrt(
                (samples[: n * self.dim].reshape(self.dim, n) ** 2).mean(axis=1)
            )
            return rms.astype(np.float32).tolist()
        return _fake_features(payload, self.dim, b"aud!").tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features_one(p) for p in batch[self.payload_col].to_pylist()]
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
    """Deterministic media rows for tests: 3/4 are REAL 24-bit BMP images
    (seeded pixels — the decode path runs genuine pixel math), 1/4 are
    opaque 'compressed' payloads exercising the stub fallback."""
    rng = np.random.RandomState(seed)
    payloads, mimes, widths, heights = [], [], [], []
    for i in range(n):
        if i % 4 != 3:
            w = int(rng.randint(8, 33))
            h = int(rng.randint(8, 33))
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(encode_bmp(img))
            mimes.append("image/bmp")
            widths.append(w)
            heights.append(h)
        else:
            payloads.append(rng.bytes(256 + int(rng.randint(0, 1024))))
            mimes.append("image/fake")
            widths.append(int(rng.randint(64, 1920)))
            heights.append(int(rng.randint(64, 1080)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "mime": pa.array(mimes),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array(np.zeros(n, np.int32)),
        }
    )


def synth_audio_table(n: int = 32, seed: int = 9) -> pa.Table:
    """Deterministic audio rows: real PCM-16 WAV payloads (seeded sine
    mixtures) so AudioFeatureStage runs genuine sample math."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rate = 8000
        dur = 0.1 + float(rng.rand()) * 0.2
        t = np.arange(int(rate * dur)) / rate
        freq = 100 + float(rng.rand()) * 1000
        samples = 0.5 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(len(t))
        rows.append((encode_wav_pcm16(rate, samples.astype(np.float32)), int(dur * 1000)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array([r[0] for r in rows], type=pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n),
            "width": pa.array(np.zeros(n, np.int32)),
            "height": pa.array(np.zeros(n, np.int32)),
            "duration_ms": pa.array([r[1] for r in rows], type=pa.int32()),
        }
    )
