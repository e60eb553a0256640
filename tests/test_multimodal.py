"""Multimodal stages: fake codecs, feature extraction, resize, frame
sampling — the Ray-side plumbing is real; decode is the documented stub."""

import numpy as np
import pyarrow as pa
import pytest

from gruut_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    ImageResizeStage,
    decode_fake_audio,
    decode_fake_image,
    encode_fake_audio,
    encode_fake_image,
    frame_sample,
)


def test_fake_image_roundtrip():
    blob = encode_fake_image(16, 8, seed=3)
    pixels = decode_fake_image(blob)
    assert pixels.shape == (8, 16, 3)
    # deterministic
    assert blob == encode_fake_image(16, 8, seed=3)
    assert blob != encode_fake_image(16, 8, seed=4)


def test_fake_audio_roundtrip():
    blob = encode_fake_audio(1600, 16000, seed=1)
    wave, rate = decode_fake_audio(blob)
    assert rate == 16000 and len(wave) == 1600
    assert np.abs(wave).max() <= 1.0


def test_real_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        ImageFeatureStage(decoder="real")
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(decoder="real")


def test_image_feature_stage_batch():
    batch = pa.table({
        "img_id": pa.array([1, 2, 3], type=pa.int64()),
        "image": pa.array([encode_fake_image(32, 16, 1),
                           encode_fake_image(8, 8, 2),
                           b"corrupt"], type=pa.binary()),
    })
    out = ImageFeatureStage()(batch)
    assert "image" not in out.column_names  # payload dropped
    assert out.column("width").to_pylist() == [32, 8, 0]
    assert out.column("decode_ok").to_pylist() == [True, True, False]
    h = out.column("phash64").to_pylist()
    assert h[0] != h[1]


def test_image_resize_stage():
    batch = pa.table({
        "image": pa.array([encode_fake_image(32, 32, 7)], type=pa.binary()),
    })
    out = ImageResizeStage(8, 8)(batch)
    resized = decode_fake_image(out.column("image")[0].as_py())
    assert resized.shape == (8, 8, 3)


def test_audio_feature_stage_batch():
    batch = pa.table({
        "clip_id": pa.array([1, 2], type=pa.int64()),
        "audio": pa.array([encode_fake_audio(32000, 16000, 5), b"x"],
                          type=pa.binary()),
    })
    out = AudioFeatureStage()(batch)
    assert out.column("duration_s").to_pylist()[0] == pytest.approx(2.0)
    assert out.column("decode_ok").to_pylist() == [True, False]
    assert out.column("rms").to_pylist()[0] > 0.1


def test_frame_sample_in_ray(ray_session):
    import ray.data

    video = b"".join(encode_fake_image(4, 4, s) for s in range(25))
    ds = ray.data.from_arrow(pa.table({
        "vid_id": pa.array([7], type=pa.int64()),
        "video": pa.array([video], type=pa.binary()),
    }))
    out = frame_sample(ds, every_n=10, concurrency=1).to_pandas()
    # frames 0, 10, 20 sampled
    assert out["frame_idx"].tolist() == [0, 10, 20]
    assert (out["vid_id"] == 7).all()
    first = decode_fake_image(out.iloc[0]["frame"])
    assert first.shape == (4, 4, 3)
