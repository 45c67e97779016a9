"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (image/audio codecs are not in
this container): ``decoder="stub"`` raises NotImplementedError (the honest
production default until a codec is wired), ``decoder="fake"`` produces a
DETERMINISTIC pseudo-decode from the payload bytes so the Ray-side plumbing
— schemas, batch sizing, actor signatures, output layout — is real and
tested end-to-end. Swapping in PIL/ffmpeg later only replaces the kernel
inside ``__init__``-loaded state.

Batch-size note (SURVEY.md §7.4): payload rows are WIDE — callers should
pass small ``batch_size`` (default 64) and let blocks hold few rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),    # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),       # metadata as crawled (may be 0/unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_decode_image(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes → (h, w, 3) uint8 via
    sha256-seeded tiling. Same payload → same pixels, any process."""
    seed = np.frombuffer(hashlib.sha256(payload).digest(), np.uint8)
    reps = int(np.ceil(h * w * 3 / len(seed)))
    return np.tile(seed, reps)[: h * w * 3].reshape(h, w, 3)


class ImageDecoder:
    """Actor-pool stage: payload → fixed-size decoded tensor + stats.

    Output: (media_id, pixels: binary of h*w*3 uint8, mean_intensity).
    State (decoder choice, target size) loads once per actor."""

    def __init__(self, *, decoder: str = "stub", target: tuple[int, int] = (32, 32)):
        if decoder not in ("stub", "fake"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.h, self.w = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "stub":
            raise NotImplementedError(
                "image codec not available in this environment; construct "
                "ImageDecoder(decoder='fake') for deterministic plumbing tests"
            )
        payloads = batch.column("payload").to_pylist()
        pixels = []
        means = np.empty(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            img = _fake_decode_image(p or b"", self.h, self.w)
            pixels.append(img.tobytes())
            means[i] = float(img.mean())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "pixels": pa.array(pixels, pa.binary()),
                "mean_intensity": pa.array(means),
            }
        )


class ImageFeaturizer:
    """Actor-pool stage: decoded pixels → feature vector (channel-mean +
    16-bin histogram = 51 float32s). Deterministic, vectorized."""

    DIM = 3 + 48

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf in batch.column("pixels").to_pylist():
            img = np.frombuffer(buf, np.uint8).astype(np.float32)
            px = img.reshape(-1, 3)
            chan_mean = px.mean(axis=0) / 255.0
            hist = np.concatenate(
                [np.histogram(px[:, c], bins=16, range=(0, 255))[0] for c in range(3)]
            ).astype(np.float32)
            hist /= max(1.0, hist.sum())
            feats.append(np.concatenate([chan_mean, hist]).astype(np.float32))
        flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float32()), self.DIM)
        return pa.table({"media_id": batch.column("media_id"), "embedding": emb})


def sample_frames(
    batch: pa.Table, *, every_ms: int = 1000
) -> pa.Table:
    """Video stage: 1→N fan-out of frame-sample rows (media_id, frame_ts_ms,
    payload) based on duration metadata. The frame EXTRACTION is the stub
    (payload passed through); the fan-out plumbing is real."""
    ids = batch.column("media_id").to_pylist()
    durs = batch.column("duration_ms").to_pylist()
    payloads = batch.column("payload").to_pylist()
    out_id, out_ts, out_p = [], [], []
    for mid, dur, p in zip(ids, durs, payloads):
        ts = list(range(0, max(int(dur or 0), 1), every_ms))
        out_id.extend([mid] * len(ts))
        out_ts.extend(ts)
        out_p.extend([p] * len(ts))
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.string()),
            "frame_ts_ms": pa.array(out_ts, pa.int32()),
            "payload": pa.array(out_p, pa.binary()),
        }
    )


def decode_images(
    ds: "ray.data.Dataset",
    *,
    decoder: str = "stub",
    target: tuple[int, int] = (32, 32),
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Wide-payload stage: SMALL batch_size, actor pool (decoder state per
    actor), zero-copy Arrow in/out."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"decoder": decoder, "target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
