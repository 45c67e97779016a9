"""Perceptual image dedup (stages/imagehash.py): hash invariance across
re-encoding, discrimination between distinct images, and the actor-pool
pairs/clusters pipeline end-to-end over synthetic PNG + JPEG payloads."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.functions.jpeg import encode_jpeg
from dupers_ray.functions.png import encode_png
from dupers_ray.stages.imagehash import (
    dhash64,
    hash_images,
    image_dup_clusters,
    image_dup_pairs,
    phash64,
    resize_area,
    to_gray,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _photo(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Smooth 'photo-like' RGB test image: random low-frequency mixture."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3))
    for c in range(3):
        for _ in range(4):
            fy, fx = rng.uniform(0.5, 3, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[..., c] += rng.uniform(20, 60) * np.sin(
                2 * np.pi * (fy * yy / h + fx * xx / w) + ph
            )
    img = img - img.min()
    return (img / img.max() * 255).astype(np.uint8)


def test_resize_area_means():
    g = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = resize_area(g, 2, 2)
    assert np.allclose(out, [[2.5, 4.5], [10.5, 12.5]])


def test_phash_survives_reencoding():
    img = _photo(1)
    g_png = to_gray(img)
    # same image re-encoded as lossy JPEG then decoded back
    from dupers_ray.functions.jpeg import decode_jpeg

    g_jpg = to_gray(decode_jpeg(encode_jpeg(img, quality=70, subsampling="420")))
    assert _ham(phash64(g_png), phash64(g_jpg)) <= 4
    assert _ham(dhash64(g_png), dhash64(g_jpg)) <= 4


def test_phash_discriminates_distinct_images():
    hs = [phash64(to_gray(_photo(s))) for s in range(12)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _ham(hs[i], hs[j]) > 10, (i, j)


def test_hash_images_actor_pool_corrupt_rows_kept():
    imgs = [_photo(s) for s in range(3)]
    rows = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array(
            [encode_png(imgs[0]), encode_jpeg(imgs[1]), b"not an image",
             encode_jpeg(imgs[2], subsampling="420")],
            pa.binary(),
        ),
    })
    out = (
        hash_images(rd.from_arrow(rows), id_col="media_id", concurrency=2)
        .to_pandas().set_index("media_id").sort_index()
    )
    assert len(out) == 4
    assert out.loc[2, "decode_error"] is not None
    assert out.loc[2, "phash"] == 0
    ok = out.drop(index=2)
    assert ok["decode_error"].isna().all()
    assert (ok["width"] == 64).all() and (ok["height"] == 48).all()


def test_image_dup_clusters_end_to_end():
    """PNG original + JPEG re-encode cluster together; distinct photos
    stay apart; corrupt rows are excluded from clustering."""
    a, b, c = _photo(10), _photo(11), _photo(12)
    payloads = [
        encode_png(a),                                  # 0
        encode_jpeg(a, quality=75),                     # 1: re-encoded dup of 0
        encode_jpeg(a, quality=40, subsampling="420"),  # 2: heavy re-encode of 0
        encode_png(b),                                  # 3
        encode_jpeg(c, quality=90),                     # 4
        b"corrupt bytes",                               # 5
    ]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(range(6), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })).repartition(3)

    pairs = image_dup_pairs(
        hash_images(ds, id_col="media_id", concurrency=2),
        id_col="media_id", hamming_threshold=6,
    ).to_pandas()
    got_pairs = set(map(tuple, pairs[["src", "dst"]].to_numpy().tolist()))
    assert (0, 1) in got_pairs and (0, 2) in got_pairs
    assert all({s, d} <= {0, 1, 2} for s, d in got_pairs)

    out = image_dup_clusters(
        ds, id_col="media_id", hamming_threshold=6, concurrency=2
    ).to_pandas().set_index("media_id")
    assert len(out) == 5  # corrupt row excluded
    assert out.loc[0, "cluster_id"] == out.loc[1, "cluster_id"] == out.loc[2, "cluster_id"] == 0
    assert out.loc[3, "cluster_id"] == 3
    assert out.loc[4, "cluster_id"] == 4


def test_small_image_hashes_not_degenerate():
    """Images smaller than the hash grids (upsampling path) must hash
    DISTINCTLY — the divide-by-zero regression collapsed every sub-32px
    image to one degenerate hash and merged unrelated thumbnails."""
    import numpy as np

    from dupers_ray.stages.imagehash import dhash64, phash64, resize_area, to_gray

    rng = np.random.default_rng(7)
    a = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    ga, gb = to_gray(a), to_gray(b)
    up = resize_area(ga, 32, 32)
    assert np.isfinite(up).all()
    assert phash64(ga) != phash64(gb) != 0
    assert dhash64(to_gray(a[:4, :4])) != dhash64(to_gray(b[:4, :4]))
    # upsampling is exact nearest-neighbor: constant image stays constant
    const = np.full((3, 5), 42.0)
    assert (resize_area(const, 32, 32) == 42.0).all()
