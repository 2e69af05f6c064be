"""Multimodal stage tests: image resize/features, audio features,
video frame sampling — kernel math unit-tested directly, Ray-side
plumbing (schema, actor-pool map_batches, flat_map explode) through a
small Dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from searchgov_spider_ray.stages.decode import fake_decode, fake_encode, phash64
from searchgov_spider_ray.stages.multimodal import (
    AudioFeatures,
    ImageFeatures,
    ImageResize,
    RealAudioCodec,
    RealVideoCodec,
    VideoFrameSample,
    fake_audio_decode,
    fake_audio_encode,
    fake_video_decode_frame_offsets,
    fake_video_encode,
    resize_nearest,
)


def _img(w, h, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def _image_batch(n=6, seed=1):
    rng = np.random.RandomState(seed)
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [], "caption": [], "phash": []}
    for i in range(n):
        w, h = int(rng.randint(40, 160)), int(rng.randint(40, 160))
        fmt = "png" if i % 2 == 0 else "jpeg"
        px = _img(w, h, seed=i)
        b = fake_encode(px, fmt)
        rows["image_id"].append(f"img{i}")
        rows["bytes"].append(b)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append(fmt)
        rows["caption"].append(f"caption {i}")
        rows["phash"].append(phash64(fake_decode(b)[0]))
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"]),
            "bytes": pa.array(rows["bytes"], type=pa.large_binary()),
            "w": pa.array(rows["w"], type=pa.int32()),
            "h": pa.array(rows["h"], type=pa.int32()),
            "fmt": pa.array(rows["fmt"]),
            "caption": pa.array(rows["caption"]),
            "phash": pa.array(rows["phash"], type=pa.uint64()),
        }
    )


class TestResize:
    def test_nearest_math(self):
        px = _img(100, 60)
        out = resize_nearest(px, 50, 30)
        assert out.shape == (30, 50, 3)
        # nearest: every output pixel is an input pixel at the mapped index
        assert out[0, 0].tolist() == px[0, 0].tolist()
        assert out[29, 49].tolist() == px[(29 * 60) // 30, (49 * 100) // 50].tolist()

    def test_resize_stage_caps_long_edge(self):
        batch = _image_batch()
        out = ImageResize(max_side=48)(batch)
        ws = out["w"].to_numpy()
        hs = out["h"].to_numpy()
        assert (np.maximum(ws, hs) <= 48).all()
        # aspect preserved within integer truncation; payload re-decodes
        for b, w, h in zip(out["bytes"].to_pylist(), ws, hs):
            px, dw, dh, _ = fake_decode(b)
            assert (dw, dh) == (w, h) and px.shape == (h, w, 3)

    def test_no_upscale(self):
        batch = _image_batch(n=2)
        out = ImageResize(max_side=4096)(batch)
        assert out["bytes"].to_pylist() == batch["bytes"].to_pylist()

    def test_resize32_matches_phash_thumbnail(self):
        # the documented invariant: 32×32 resize uses the same sampling
        # grid as the pHash thumbnail
        px = _img(120, 80)
        small = resize_nearest(px, 32, 32)
        assert phash64(small) == phash64(px)


class TestImageFeatures:
    def test_feature_layout(self):
        out = ImageFeatures()(_image_batch())
        feats = out["features"].to_pylist()
        assert all(len(f) == ImageFeatures.DIM for f in feats)
        assert all(out["decode_ok"].to_pylist())
        f = np.array(feats[0])
        assert 0.0 <= f[0] <= 1.0  # mean R normalized
        assert abs(f[6:22].sum() - 1.0) < 1e-5  # histogram sums to 1

    def test_bad_bytes_flagged(self):
        batch = _image_batch(n=2)
        bad = batch.set_column(1, "bytes", pa.array([b"junk", b""], type=pa.large_binary()))
        out = ImageFeatures()(bad)
        assert out["decode_ok"].to_pylist() == [False, False]


class TestAudio:
    def test_roundtrip_and_features(self):
        rate = 8000
        t = np.arange(rate * 2)  # 2 s
        wave = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype(np.int16)
        b = fake_audio_encode(wave, rate)
        samples, r = fake_audio_decode(b)
        assert r == rate and np.array_equal(samples, wave)
        out = AudioFeatures(window_s=0.5)(
            pa.table({"audio_id": ["a"], "bytes": pa.array([b], type=pa.large_binary())})
        )
        assert out["duration_s"].to_pylist() == [2.0]
        rms = out["rms"].to_pylist()[0]
        zcr = out["zcr"].to_pylist()[0]
        assert len(rms) == 4 and len(zcr) == 4
        # sine RMS = amplitude/sqrt(2)
        assert abs(rms[0] - (20000 / 32768.0) / np.sqrt(2)) < 1e-3
        # 440 Hz crosses zero ~880 times/s → zcr ≈ 880/8000
        assert abs(zcr[0] - 880 / 8000) < 0.01

    def test_real_codec_is_stub(self):
        with pytest.raises(NotImplementedError):
            RealAudioCodec().decode(b"x")
        with pytest.raises(NotImplementedError):
            RealVideoCodec().decode(b"x")


class TestVideo:
    def _video(self, n_frames=25, seed=3):
        frames = [_img(64, 48, seed=seed + i) for i in range(n_frames)]
        return frames, fake_video_encode(frames)

    def test_offsets_cover_all_frames(self):
        frames, b = self._video()
        offs = fake_video_decode_frame_offsets(b)
        assert len(offs) == len(frames)
        for (off, ln), f in zip(offs, frames):
            px, w, h, _ = fake_decode(b[off : off + ln])
            assert np.array_equal(px, f)

    def test_frame_sample_explodes(self):
        frames, b = self._video(n_frames=25)
        batch = pa.table(
            {"video_id": ["v0"], "bytes": pa.array([b], type=pa.large_binary())}
        )
        out = VideoFrameSample(stride=10)(batch)
        assert out["frame_idx"].to_pylist() == [0, 10, 20]
        assert out["video_id"].to_pylist() == ["v0"] * 3
        # phash of a sampled frame matches hashing the frame directly
        assert out["phash"].to_pylist()[1] == phash64(frames[10])

    def test_dataset_plumbing(self, ray_session):
        _, b0 = self._video(n_frames=12, seed=5)
        _, b1 = self._video(n_frames=7, seed=9)
        ds = rd.from_arrow(
            pa.table(
                {"video_id": ["a", "b"], "bytes": pa.array([b0, b1], type=pa.large_binary())}
            )
        )
        out = ds.map_batches(
            VideoFrameSample(stride=5), batch_format="pyarrow", batch_size=1
        ).map_batches(ImageFeatures(), batch_format="pyarrow")
        df = out.to_pandas()
        assert sorted(df["video_id"].unique()) == ["a", "b"]
        assert len(df) == 3 + 2  # ceil(12/5)=3 frames + ceil(7/5)=2
        assert all(len(f) == ImageFeatures.DIM for f in df["features"])
