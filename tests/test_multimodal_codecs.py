"""Real pure-numpy media codecs: BMP/PPM/WAV round-trips and the tiered
decode paths of the multimodal stages (real decode for uncompressed
formats, deterministic stub for compressed ones)."""

import numpy as np
import pyarrow as pa

from geomesa_nifi_ray.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    decode_bmp,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
    synth_audio_table,
    synth_media_table,
)


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(1)
    for w, h in [(7, 5), (16, 16), (33, 9)]:  # odd widths exercise row padding
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        back = decode_bmp(encode_bmp(img))
        assert back is not None and back.shape == (h, w, 3)
        assert np.array_equal(back, img)


def test_bmp_rejects_non_bmp():
    assert decode_bmp(b"not a bmp at all" * 10) is None
    assert decode_bmp(b"BM" + b"\x00" * 10) is None  # truncated


def test_ppm_roundtrip():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    data = b"P6\n# comment\n6 4\n255\n" + img.tobytes()
    back = decode_ppm(data)
    assert back is not None and np.array_equal(back, img)


def test_wav_roundtrip():
    t = np.arange(800) / 8000.0
    samples = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rate, back = decode_wav_pcm16(encode_wav_pcm16(8000, samples))
    assert rate == 8000
    assert np.abs(back - samples).max() < 1e-3  # 16-bit quantization only


def test_image_stage_real_vs_stub_paths():
    stage = ImageDecodeStage(size=(8, 8), feature_dim=12)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(10, 10, 3)).astype(np.uint8)
    real = stage._decode_one(encode_bmp(img))
    # real path: features derive from actual pixel means, all within [0,1],
    # and a solid-color image pools to that color exactly
    solid = np.full((10, 10, 3), 255, dtype=np.uint8)
    f_solid = stage._decode_one(encode_bmp(solid))
    assert np.allclose(f_solid, 1.0)
    black = np.zeros((10, 10, 3), dtype=np.uint8)
    assert np.allclose(stage._decode_one(encode_bmp(black)), 0.0)
    assert real is not None and len(real) == 12 and 0 <= real.min() <= real.max() <= 1
    # stub path still deterministic for opaque payloads
    fake1 = stage._decode_one(b"\x89PNG fake payload")
    fake2 = stage._decode_one(b"\x89PNG fake payload")
    assert np.array_equal(fake1, fake2)


def test_audio_stage_real_energy():
    stage = AudioFeatureStage(feature_dim=8)
    # a silent wav must have ~zero RMS everywhere; a loud one must not
    silent = encode_wav_pcm16(8000, np.zeros(4000, dtype=np.float32))
    loud = encode_wav_pcm16(8000, np.full(4000, 0.9, dtype=np.float32))
    fs = stage._features_one(silent)
    fl = stage._features_one(loud)
    assert max(fs) < 1e-4
    assert min(fl) > 0.85


def test_media_stage_over_synth_tables(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth_media_table(32, seed=3))
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow", batch_size=8,
                         concurrency=2, fn_constructor_kwargs={"feature_dim": 8}).to_pandas()
    assert len(out) == 32 and out["image_features"].map(len).eq(8).all()

    ads = ray.data.from_arrow(synth_audio_table(16, seed=9))
    aout = ads.map_batches(AudioFeatureStage, batch_format="pyarrow",
                           batch_size=8, concurrency=2).to_pandas()
    assert len(aout) == 16 and aout["audio_features"].map(len).eq(32).all()
