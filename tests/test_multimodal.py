from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.stages.multimodal import (
    ImageDecoder,
    ImageFeaturizer,
    decode_images,
    sample_frames,
)


def _media(n=6):
    return pa.table(
        {
            "media_id": [f"m{i}" for i in range(n)],
            "kind": ["image"] * n,
            "payload": pa.array([f"imgbytes{i}".encode() for i in range(n)], pa.binary()),
            "mime": ["image/jpeg"] * n,
            "width": pa.array([640] * n, pa.int32()),
            "height": pa.array([480] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        }
    )


def test_stub_decoder_raises():
    dec = ImageDecoder(decoder="stub")
    with pytest.raises(NotImplementedError):
        dec(_media())


def test_fake_decode_deterministic_pipeline():
    ds = rd.from_arrow(_media()).repartition(2)
    out = decode_images(ds, decoder="fake", target=(8, 8)).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {"media_id", "pixels", "mean_intensity"}
    assert all(len(p) == 8 * 8 * 3 for p in out["pixels"])
    # determinism: same payload → same pixels across runs
    out2 = decode_images(rd.from_arrow(_media()), decoder="fake", target=(8, 8)).to_pandas()
    m1 = dict(zip(out["media_id"], out["pixels"]))
    m2 = dict(zip(out2["media_id"], out2["pixels"]))
    assert m1 == m2
    # different payloads → different pixels
    assert m1["m0"] != m1["m1"]


def test_featurizer_shapes():
    ds = rd.from_arrow(_media())
    feats = (
        decode_images(ds, decoder="fake", target=(8, 8))
        .map_batches(ImageFeaturizer, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert len(feats) == 6
    v = np.asarray(feats["embedding"][0])
    assert v.shape == (51,) and v.dtype == np.float32


def test_sample_frames_fanout():
    t = pa.table(
        {
            "media_id": ["v1", "v2"],
            "duration_ms": pa.array([3500, 800], pa.int32()),
            "payload": pa.array([b"vid1", b"vid2"], pa.binary()),
        }
    )
    out = sample_frames(t, every_ms=1000)
    rows = list(zip(out.column("media_id").to_pylist(), out.column("frame_ts_ms").to_pylist()))
    assert rows == [("v1", 0), ("v1", 1000), ("v1", 2000), ("v1", 3000), ("v2", 0)]
