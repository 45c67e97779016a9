"""Perceptual image hashing + near-duplicate detection over decoded
pixels — pHash (DCT) and dHash (gradient), public techniques described
in e.g. Zauner 2010 ("Implementation and Benchmarking of Perceptual
Image Hash Functions") and widely reimplemented.

Pipeline shape (100-TB posture identical to the text flagship):
1. ``ImageHasher`` actor pool: payload bytes → decode (from-scratch
   PNG / baseline-JPEG codecs — functions/png.py, functions/jpeg.py) →
   grayscale → area-resize → 64-bit pHash + dHash. Decoder state (DCT
   matrix, codec dispatch) is built once per actor; payloads never
   leave the batch. Undecodable rows keep (id, error) — never dropped
   (the explode_archives corrupt-row contract).
2. Hamming-close pairs via the pigeonhole band machinery SHARED with
   text SimHash (stages/simhash.hamming_pairs_from_sigs): threshold+1
   bands, one groupby shuffle of 16-byte rows, exact popcount verify.
3. Clusters via the flagship's connected-components + assignment
   machinery (pipelines/components, pipelines/dupe.assign_clusters).

Why decoded pixels: byte-level digests (the reference's checksum on
archive members, pkg/dupe/dupe.go:648) miss re-encoded copies; pHash of
the DECODED image survives JPEG quality changes, format conversion
(PNG↔JPEG) and small crops/rescales.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _dct_mat_n(n: int) -> np.ndarray:
    """n-point DCT-II orthonormal basis (generalizes functions/jpeg._C)."""
    k = np.arange(n)[:, None].astype(np.float64)
    m = np.arange(n)[None, :].astype(np.float64)
    c = np.cos((2 * m + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


def resize_area(gray: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Area-average resize of a 2-D float array to (oh, ow): each output
    cell is the mean of its source bin (np.add.reduceat over bin edges
    both axes) — smoothing resize, the right pre-filter for hashing
    (nearest-neighbor aliases high-frequency content into the hash)."""
    h, w = gray.shape
    if h == 0 or w == 0:
        return np.zeros((oh, ow), np.float64)
    ys = (np.arange(oh, dtype=np.int64) * h) // oh
    xs = (np.arange(ow, dtype=np.int64) * w) // ow
    rows = np.add.reduceat(gray.astype(np.float64), ys, axis=0)
    both = np.add.reduceat(rows, xs, axis=1)
    # upsampling axis (source smaller than target): bin edges repeat,
    # reduceat returns the single source element for the repeated bin and
    # np.diff gives a 0 count — clamp to 1 for exact nearest-neighbor
    # behavior instead of a divide-by-zero that collapses every small
    # image to one degenerate hash
    ycnt = np.maximum(np.diff(np.append(ys, h)), 1).astype(np.float64)
    xcnt = np.maximum(np.diff(np.append(xs, w)), 1).astype(np.float64)
    return both / (ycnt[:, None] * xcnt[None, :])


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → (h, w) float64 BT.601 luma."""
    f = img.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


_PHASH_C32 = _dct_mat_n(32)


def phash64(gray: np.ndarray) -> int:
    """64-bit pHash: 32x32 area-resize → 2-D DCT → 8x8 low-frequency
    block (minus DC) → sign vs median."""
    small = resize_area(gray, 32, 32)
    coef = _PHASH_C32 @ small @ _PHASH_C32.T
    low = coef[:8, :8].copy().ravel()
    low[0] = 0.0  # DC carries overall brightness; excluded from median
    med = np.median(low[1:])
    bits = low > med
    bits[0] = False
    return int(np.packbits(bits).view(">u8")[0])


def dhash64(gray: np.ndarray) -> int:
    """64-bit dHash: 8x9 area-resize → horizontal gradient sign."""
    small = resize_area(gray, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def _decode_any(payload: bytes) -> np.ndarray:
    """Magic-dispatch decode to (h, w, 3) uint8 via the from-scratch
    codecs; raises ValueError-family on anything else."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from dupers_ray.functions.png import decode_png

        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from dupers_ray.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError("unknown image format (png/jpeg magic expected)")


class ImageHasher:
    """Actor-pool stage: (id, payload) → (id, phash, dhash, width,
    height, decode_error). Failed decodes keep the row with
    decode_error set and zero hashes — accounting over corrupt crawl
    data is the caller's job, not silent row loss."""

    def __init__(self, *, id_col: str = "media_id", payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col
        # touch decoder state once per actor (codec dispatch + DCT bases)
        self._decode = _decode_any
        self._c32 = _PHASH_C32

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        n = len(payloads)
        ph = np.zeros(n, np.uint64)
        dh = np.zeros(n, np.uint64)
        ww = np.zeros(n, np.int32)
        hh = np.zeros(n, np.int32)
        err: list[str | None] = [None] * n
        for i, p in enumerate(payloads):
            try:
                img = self._decode(p or b"")
                g = to_gray(img)
                ph[i] = phash64(g)
                dh[i] = dhash64(g)
                hh[i], ww[i] = img.shape[0], img.shape[1]
            except Exception as ex:  # noqa: BLE001 — corrupt rows flow on
                err[i] = f"{type(ex).__name__}: {ex}"
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "phash": pa.array(ph),
                "dhash": pa.array(dh),
                "width": pa.array(ww),
                "height": pa.array(hh),
                "decode_error": pa.array(err, pa.string()),
            }
        )


def hash_images(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Perceptual hashes for every image row (small batch_size: payload
    rows are wide — SURVEY §7.4 batch-sizing note)."""
    return ds.select_columns([id_col, payload_col]).map_batches(
        ImageHasher,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_dup_pairs(
    hashes: "ray.data.Dataset",
    *,
    id_col: str = "media_id",
    hash_col: str = "phash",
    hamming_threshold: int = 6,
    num_partitions: int = 256,
) -> "ray.data.Dataset":
    """(src, dst, hamming) over hashed images — pigeonhole-complete for
    the threshold, one band-key shuffle (16 B/row), exact verify. The
    id column must be integer (uint64-safe); decode-error rows are
    excluded (zero hashes would all collide)."""
    from dupers_ray.stages.simhash import hamming_pairs_from_sigs

    import pyarrow.compute as pc

    def prep(t: pa.Table) -> pa.Table:
        ok = pc.is_null(t.column("decode_error"))
        t = t.filter(ok)
        return pa.table({
            "node": t.column(id_col).cast(pa.uint64()),
            "simhash": t.column(hash_col).cast(pa.uint64()),
        })

    sigs = hashes.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return hamming_pairs_from_sigs(
        sigs, hamming_threshold=hamming_threshold,
        num_partitions=num_partitions,
    )


def image_dup_clusters(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_col: str = "phash",
    hamming_threshold: int = 6,
    concurrency: int | tuple[int, int] = (1, 8),
) -> "ray.data.Dataset":
    """Every decodable image row → (id, cluster_id = min id of its
    perceptual-dup component); singletons keep their own id. Reuses the
    text flagship's components + assignment machinery (same scale
    switches: driver union-find below the edge cap, large/small-star
    beyond; broadcast-or-join assignment)."""
    from dupers_ray.pipelines.components import components
    from dupers_ray.pipelines.dupe import assign_clusters

    hashes = hash_images(
        ds, id_col=id_col, payload_col=payload_col, concurrency=concurrency
    ).materialize()  # consumed twice: pairs + assignment mapping
    pairs = image_dup_pairs(
        hashes, id_col=id_col, hash_col=hash_col,
        hamming_threshold=hamming_threshold,
    )

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t.column("src").cast(pa.uint64()),
            "dst": t.column("dst").cast(pa.uint64()),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    assign = components(edges)

    import pyarrow.compute as pc

    def to_mapping(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("decode_error")))
        return pa.table({
            id_col: t.column(id_col),
            "node": t.column(id_col).cast(pa.uint64()),
        })

    mapping = hashes.map_batches(
        to_mapping, batch_format="pyarrow", zero_copy_batch=True
    )
    return assign_clusters(mapping, assign, id_col=id_col)
