"""Multimodal stage plumbing (schemas/batching real, decode stubbed)."""

import pyarrow as pa
import pytest

from deepseek_ocr_customvllm_ray.stages import multimodal as mm


def _images(n=6):
    return pa.table({
        "id": list(range(n)),
        "media": pa.array([f"imgbytes-{i}".encode() * 100 for i in range(n)], pa.binary()),
        "mime": ["image/jpeg"] * n,
    })


class TestImagePipeline:
    def test_decode_resize_embed(self, ray_session):
        import ray.data as rd

        out = mm.apply_image_pipeline(rd.from_arrow(_images()), batch_size=2).to_pandas()
        assert len(out) == 6
        assert all(len(v) == 32 for v in out["embedding"])

    def test_deterministic_across_runs(self, ray_session):
        import ray.data as rd

        a = mm.apply_image_pipeline(rd.from_arrow(_images())).to_pandas().sort_values("id")
        b = mm.apply_image_pipeline(rd.from_arrow(_images())).to_pandas().sort_values("id")
        assert [list(v) for v in a["embedding"]] == [list(v) for v in b["embedding"]]

    def test_resize_bounds(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_images()).map_batches(
            mm.ImageDecodeStage, batch_format="pyarrow", concurrency=1
        ).map_batches(
            mm.ImageResizeStage, batch_format="pyarrow", concurrency=1,
            fn_constructor_kwargs={"max_side": 100},
        )
        out = ds.to_pandas()
        assert (out["width"] <= 100).all() and (out["height"] <= 100).all()

    def test_strict_mode_surfaces_stub(self):
        with pytest.raises(NotImplementedError):
            mm.ImageDecodeStage(strict=True)(_images())


class TestAudioVideo:
    def test_audio_features(self, ray_session):
        import ray.data as rd

        t = pa.table({
            "id": [1, 2],
            "media": pa.array([b"a" * 50, b"b" * 50], pa.binary()),
            "mime": ["audio/wav"] * 2,
            "sample_rate": pa.array([16000, 8000], pa.int32()),
            "n_samples": pa.array([32000, 8000], pa.int64()),
        })
        out = rd.from_arrow(t).map_batches(
            mm.AudioFeatureStage, batch_format="pyarrow", concurrency=1
        ).to_pandas().sort_values("id")
        assert out["duration_s"].tolist() == [2.0, 1.0]

    def test_video_frame_sampling(self, ray_session):
        import ray.data as rd

        t = pa.table({
            "id": [7],
            "media": pa.array([b"vid" * 30], pa.binary()),
            "mime": ["video/mp4"],
            "fps": pa.array([30.0], pa.float64()),
            "n_frames": pa.array([100], pa.int64()),
        })
        out = rd.from_arrow(t).map_batches(
            mm.VideoFrameSampleStage, batch_format="pyarrow", concurrency=1,
            fn_constructor_kwargs={"k": 4},
        ).to_pandas()
        assert out["frame_no"].tolist() == [0, 25, 50, 75]
