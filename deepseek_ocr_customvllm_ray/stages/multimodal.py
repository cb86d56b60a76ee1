"""Multimodal column stages: image / audio / video as opaque binary columns
with typed metadata.

The decode kernels themselves are STUBBED (PIL / torchaudio / ffmpeg are not
in this container — ``functions/fakemedia.py`` pattern): every stage raises
``NotImplementedError`` from the stub when ``strict=True`` or computes a
deterministic fake when ``strict=False``.  The Ray-side plumbing — schemas,
actor-pool signatures, batch sizing for multi-MB binary rows, output layout
— is real and tested.

Schema conventions (Arrow):
  image:  (id, media: binary, mime: string, width: int32, height: int32)
  audio:  (id, media: binary, mime: string, sample_rate: int32, n_samples: int64)
  video:  (id, media: binary, mime: string, fps: float64, n_frames: int64)

Memory sizing: binary payloads make rows multi-MB, so these stages use
SMALL ``batch_size`` (default 8) and bounded actor pools; at 100 TB let the
object store spill rather than raising batch size.
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa


def _fake_digest(payload: bytes, salt: str) -> np.ndarray:
    h = hashlib.sha256(salt.encode() + payload).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


class ImageDecodeStage:
    """Actor-pool stage: decode image bytes -> (width, height, mode).

    Real deployment: ``PIL.Image.open`` in ``__call__``; weights-free but
    kept as an actor so a real decoder can cache codec state.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict  # strict=True surfaces the stub explicitly

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL, not available in this environment"
            )
        widths, heights, modes = [], [], []
        for payload in batch["media"].to_pylist():
            d = _fake_digest(payload or b"", "decode")
            widths.append(int(64 + d[0]) * 4)
            heights.append(int(64 + d[1]) * 4)
            modes.append("RGB")
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("mode", pa.array(modes, pa.string()))
        )


def pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except Exception:
        return False


class PilImageDecodeStage:
    """Real decode twin of :class:`ImageDecodeStage` — identical stage
    signature (Arrow batch in, width/height/mode columns appended), PIL in
    ``__call__``; actor form keeps codec state warm per worker.

    Import-guarded: constructing it without PIL raises ImportError (fail
    fast on the driver); use :func:`make_image_decode_stage` for automatic
    fallback to the stubbed stage.  An undecodable payload yields
    (0, 0, "") rather than failing the batch — per-row validity stays a
    downstream filter, as in the validate stage."""

    def __init__(self):
        from PIL import Image  # noqa: F401 — fail fast if PIL is absent

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        from PIL import Image

        widths, heights, modes = [], [], []
        for payload in batch["media"].to_pylist():
            try:
                with Image.open(io.BytesIO(payload or b"")) as im:
                    widths.append(int(im.width))
                    heights.append(int(im.height))
                    modes.append(str(im.mode))
            except Exception:
                widths.append(0)
                heights.append(0)
                modes.append("")
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("mode", pa.array(modes, pa.string()))
        )


def make_image_decode_stage(prefer_real: bool = True):
    """Deployment seam as CONFIG: the PIL-backed stage class when the
    library exists (and ``prefer_real``), else the stub — pass the result
    to ``map_batches`` directly; both classes share the stage signature."""
    if prefer_real and pil_available():
        return PilImageDecodeStage
    return ImageDecodeStage


class ImageResizeStage:
    """Actor-pool stage: resize to a target box (dimension arithmetic real,
    pixel work stubbed — output payload is a deterministic fake)."""

    def __init__(self, max_side: int = 640, strict: bool = False):
        self.max_side = max_side
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image resize requires PIL")
        out_w, out_h, out_payload = [], [], []
        for payload, w, h in zip(
            batch["media"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            scale = min(1.0, self.max_side / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            out_w.append(nw)
            out_h.append(nh)
            out_payload.append(
                b"FAKERESIZED\x00" + hashlib.sha1((payload or b"") + f"{nw}x{nh}".encode()).digest()
            )
        return pa.table({
            "id": batch["id"],
            "media": pa.array(out_payload, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
        })


class ImageEmbedStage:
    """Actor-pool stage: image -> feature vector (model load in __init__).

    Real deployment loads a vision encoder once per actor; here the
    "features" are a deterministic 32-d digest so downstream similarity /
    dedup plumbing is exercised end-to-end.
    """

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        self.strict = strict  # the model-load slot

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image embedding requires a vision model")
        vecs = []
        for payload in batch["media"].to_pylist():
            d = _fake_digest(payload or b"", "embed")
            v = d[: self.dim] / 255.0
            vecs.append(v.tolist())
        return pa.table({
            "id": batch["id"],
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })


class AudioFeatureStage:
    """Audio -> (duration_s, rms-ish score); decode stubbed."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("audio decode requires an audio library")
        durs, scores = [], []
        for payload, sr, n in zip(
            batch["media"].to_pylist(),
            batch["sample_rate"].to_pylist(),
            batch["n_samples"].to_pylist(),
        ):
            durs.append(float(n) / float(sr or 16000))
            scores.append(float(_fake_digest(payload or b"", "rms")[0]) / 255.0)
        return pa.table({
            "id": batch["id"],
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(scores, pa.float64()),
        })


class VideoFrameSampleStage:
    """Video -> k sampled frame records (frame indices real, frames fake)."""

    def __init__(self, k: int = 4, strict: bool = False):
        self.k = k
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video decode requires ffmpeg")
        ids, frame_nos, frames = [], [], []
        for i, payload, n_frames in zip(
            batch["id"].to_pylist(),
            batch["media"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            n = max(1, int(n_frames))
            k = min(self.k, n)
            # evenly-spaced deterministic frame indices
            for j in range(k):
                fno = (j * n) // k
                ids.append(i)
                frame_nos.append(fno)
                frames.append(
                    b"FAKEFRAME\x00" + hashlib.sha1((payload or b"") + str(fno).encode()).digest()
                )
        return pa.table({
            "id": pa.array(ids),
            "frame_no": pa.array(frame_nos, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def apply_image_pipeline(ds, batch_size: int = 8, concurrency=(1, 4)):
    """decode -> resize -> embed over an image table (the canonical wiring:
    small batches for multi-MB rows, actor pools, Arrow throughout)."""
    ds = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
    ds = ds.map_batches(
        ImageResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
    return ds.map_batches(
        ImageEmbedStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def apply_audio_pipeline(ds, batch_size: int = 8, concurrency=(1, 4)):
    """Audio feature extraction over an audio table (same actor-pool /
    small-batch conventions as the image pipeline)."""
    return ds.map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def apply_video_pipeline(ds, k: int = 4, batch_size: int = 8, concurrency=(1, 4)):
    """Frame sampling over a video table: one row per sampled frame."""
    return ds.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"k": k},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )
