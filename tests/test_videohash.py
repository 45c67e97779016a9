"""Video perceptual dedup (stages/videohash.py): DVID container
roundtrip + fuzz safety, scene-centered slot sampling, cross-encoding
invariance of slot hashes, and the majority-vote cluster pipeline
end-to-end over synthetic videos."""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.stages.videohash import (
    VideoFrameHasher,
    encode_video,
    hash_video_frames,
    parse_video,
    sample_slot_indices,
    video_dup_clusters,
)
from dupers_ray.synth import _photo_scene, synth_doc_videos


def _video(key: bytes, *, n_frames: int, fps: int, size, jpeg: bool,
           n_scenes: int = 3) -> bytes:
    from dupers_ray.functions.jpeg import encode_jpeg
    from dupers_ray.functions.png import encode_png

    h, w = size
    enc = (lambda a: encode_jpeg(a, quality=75)) if jpeg else encode_png
    scenes = [enc(_photo_scene(key, s, h, w)) for s in range(n_scenes)]
    frames = [scenes[min(i * n_scenes // n_frames, n_scenes - 1)]
              for i in range(n_frames)]
    return encode_video(frames, fps=fps)


KEY_A = hashlib.sha256(b"prefix A").digest()
KEY_B = hashlib.sha256(b"prefix B").digest()


def test_container_roundtrip():
    frames = [b"frame-one", b"", b"frame-three" * 100]
    fps, out = parse_video(encode_video(frames, fps=24))
    assert fps == 24 and out == frames


@pytest.mark.parametrize("blob", [
    b"", b"DVID", b"RIFF1234", b"DVID" + b"\x00" * 8,
    encode_video([b"x"], 10)[:-1],               # truncated body
    b"DVID" + bytes([1, 0, 10, 0, 255, 255, 255, 255]),  # absurd count
])
def test_parse_rejects_garbage(blob):
    with pytest.raises(ValueError):
        parse_video(blob)


def test_slot_sampling_scene_centered():
    # 3 scenes spread over different frame counts: slot s must land in
    # scene s for every rendering
    for n_frames in (3, 6, 9, 30):
        idxs = sample_slot_indices(n_frames, 3)
        scenes = [min(int(i) * 3 // n_frames, 2) for i in idxs]
        assert scenes == [0, 1, 2], (n_frames, idxs)
    assert sample_slot_indices(1, 3).tolist() == [0, 0, 0]


def test_slot_hashes_invariant_across_encoding():
    a = _video(KEY_A, n_frames=6, fps=10, size=(48, 64), jpeg=False)
    b = _video(KEY_A, n_frames=9, fps=15, size=(36, 48), jpeg=True)
    hasher = VideoFrameHasher(id_col="media_id", n_slots=3)
    t = hasher(pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([a, b], pa.binary()),
    })).to_pandas()
    for s in range(3):
        ha = np.uint64(t[(t.media_id == 0) & (t.slot == s)].dhash.iloc[0])
        hb = np.uint64(t[(t.media_id == 1) & (t.slot == s)].dhash.iloc[0])
        assert bin(int(ha) ^ int(hb)).count("1") <= 9, s


def test_corrupt_rows_kept():
    hasher = VideoFrameHasher(id_col="media_id", n_slots=3)
    t = hasher(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([b"not a video"], pa.binary()),
    })).to_pandas()
    assert len(t) == 1 and t.slot.iloc[0] == -1
    assert t.decode_error.iloc[0] is not None


def test_video_dup_clusters_end_to_end():
    payloads = [
        _video(KEY_A, n_frames=6, fps=10, size=(48, 64), jpeg=False),   # 0
        _video(KEY_A, n_frames=9, fps=15, size=(36, 48), jpeg=True),    # 1: re-render of 0
        _video(KEY_B, n_frames=6, fps=10, size=(48, 64), jpeg=False),   # 2
        b"garbage",                                                      # 3
    ]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })).repartition(2)

    hashes = hash_video_frames(ds, id_col="media_id", concurrency=2).to_pandas()
    assert (hashes[hashes.media_id == 0].n_frames == 6).all()
    assert (hashes[hashes.media_id == 1].fps == 15).all()

    got = (
        video_dup_clusters(ds, id_col="media_id", concurrency=2)
        .to_pandas().set_index("media_id").sort_index()
    )
    assert len(got) == 3  # corrupt row excluded
    assert got.loc[0, "cluster_id"] == got.loc[1, "cluster_id"] == 0
    assert got.loc[2, "cluster_id"] == 2


def test_synth_doc_videos_matches_oracle_contract():
    # two docs sharing a 40-char prefix, one distinct
    texts = [
        "shared prefix shared prefix shared prefix AAA tail one",
        "shared prefix shared prefix shared prefix AAA tail two",
        "a completely different document body with other words",
    ]
    # prefix 40 of texts[0] and [1] are identical
    assert texts[0][:40] == texts[1][:40] and texts[0][:40] != texts[2][:40]
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts),
    })
    media = rd.from_arrow(synth_doc_videos(batch))
    got = (
        video_dup_clusters(media, id_col="doc_id", concurrency=2)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "cluster_id"] == got.loc[1, "cluster_id"] == 0
    assert got.loc[2, "cluster_id"] == 2
