"""Embedding similarity: brute-force cosine top-k, threshold pairs, and an
LSH (random-hyperplane) bucketed variant as the scale path.

Engine-side addition for training-data pipelines (no reference analogue).
Patterns:
- the query matrix / corpus matrix is broadcast ONCE via ``ray.put`` and
  read per task — never re-pickled per batch;
- per-batch math is a single sgemm (numpy matmul over float32);
- the LSH variant buckets by sign-pattern of random projections and only
  compares within buckets (one groupby shuffle) — approximate, used when
  the corpus no longer fits a broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.functions.hashing import splitmix64


def _mat(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, dim) float32 matrix (zero-copy flatten)."""
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _norm(m: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(m, axis=1, keepdims=True)
    d[d == 0] = 1.0
    return m / d


def topk_cosine(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Exact top-k by cosine per query vector. Per-batch partial top-k
    (matmul against the broadcast query matrix), then one tiny groupby to
    merge partials — the corpus itself is never collected.
    Output: (query_id, vec_id, score) with k rows per query.
    Ties broken by ascending ``vec_id`` (deterministic)."""
    qm = _norm(np.asarray(queries, np.float32))
    qids = (
        np.arange(qm.shape[0], dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, np.int64)
    )
    ref = ray.put((qm, qids))

    def partial(t: pa.Table) -> pa.Table:
        qm_, qids_ = ray.get(ref)
        emb = _norm(_mat(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if emb.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        # float64 accumulate: keeps rank order stable vs double-precision
        # oracles; storage/shuffle stay float32
        scores = emb.astype(np.float64) @ qm_.T.astype(np.float64)  # (n, Q)
        kk = min(k, scores.shape[0])
        # per query: indices of top-kk scores (ties → lower vec_id first)
        order = np.lexsort((ids[:, None].repeat(scores.shape[1], 1), -scores), axis=0)[:kk]
        out_q, out_i, out_s = [], [], []
        for qi in range(scores.shape[1]):
            sel = order[:, qi]
            out_q.extend([int(qids_[qi])] * len(sel))
            out_i.extend(ids[sel].tolist())
            out_s.extend(scores[sel, qi].astype(np.float64).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_i, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)[["query_id", id_col, "score"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def cosine_pairs_broadcast(
    ds: "ray.data.Dataset",
    corpus_ids: np.ndarray,
    corpus_mat: np.ndarray,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """EXACT all-pairs cosine >= threshold: the (normalized) corpus matrix is
    broadcast once; each batch compares its rows against the whole corpus.
    Emits (a, b) with a < b. O(n*N) work — the exact-verification path; use
    ``cosine_pairs_lsh`` when the corpus matrix can't be broadcast."""
    cm = _norm(np.asarray(corpus_mat, np.float32))
    cids = np.asarray(corpus_ids, np.int64)
    ref = ray.put((cm, cids))

    def f(t: pa.Table) -> pa.Table:
        cm_, cids_ = ray.get(ref)
        emb = _norm(_mat(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if emb.size == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        scores = emb @ cm_.T
        bi, bj = np.nonzero(scores >= threshold)
        a, b = ids[bi], cids_[bj]
        keep = a < b  # dedupe (a,b)/(b,a) and drop self-pairs
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "cosine": pa.array(scores[bi, bj][keep].astype(np.float64))})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def cosine_pairs_lsh(
    ds: "ray.data.Dataset",
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    n_tables: int = 8,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Approximate cosine pairs via random-hyperplane LSH: sign-pattern of
    ``n_planes`` projections = bucket key, repeated over ``n_tables``
    independent tables (recall boost); exact cosine verify within buckets.
    One groupby shuffle; scales past broadcastable corpora."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    ref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(ref)
        emb = _norm(_mat(t.column(emb_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = emb.shape[0]
        if n == 0:
            return pa.table({
                "bucket": pa.array([], pa.uint64()),
                id_col: pa.array([], pa.int64()),
                "emb": pa.array([], pa.binary()),
            })
        emb_bytes = [emb[i].tobytes() for i in range(n)]
        out_b, out_i, out_e = [], [], []
        pw = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        for tab in range(n_tables):
            signs = (emb @ pl[tab].T) > 0  # (n, planes)
            key = (signs.astype(np.uint64) * pw).sum(axis=1)
            with np.errstate(over="ignore"):
                key = splitmix64(key + np.uint64(tab) * np.uint64(0x9E3779B97F4A7C15))
            out_b.extend(key.tolist())
            out_i.extend(ids.tolist())
            out_e.extend(emb_bytes)
        return pa.table({"bucket": pa.array(out_b, pa.uint64()),
                         id_col: pa.array(out_i, pa.int64()),
                         "emb": pa.array(out_e, pa.binary())})

    import pandas as pd

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b_, out_c = [], [], []
        for _, sub in g.groupby("bucket", sort=False):
            sub = sub.drop_duplicates(subset=[id_col])
            if len(sub) < 2:
                continue
            ids = sub[id_col].to_numpy()
            m = np.frombuffer(b"".join(sub["emb"]), dtype=np.float32).reshape(len(sub), -1)
            s = m @ m.T
            bi, bj = np.nonzero(np.triu(s >= threshold, k=1))
            a, b = ids[bi], ids[bj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.extend(lo.tolist())
            out_b_.extend(hi.tolist())
            out_c.extend(s[bi, bj].astype(np.float64).tolist())
        return pd.DataFrame({"a": pd.Series(out_a, dtype=np.int64),
                             "b": pd.Series(out_b_, dtype=np.int64),
                             "cosine": pd.Series(out_c, dtype=np.float64)})

    def add_part(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("bucket"), dtype=np.uint64)
        return t.append_column("__part", pa.array((v % np.uint64(256)).astype(np.int64)))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = (
        bucketed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # cross-table dedup
    import pandas as pd

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)[["a", "b", "cosine"]]

    def pair_part(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), dtype=np.uint64)
        b = np.asarray(t.column("b"), dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(a * np.uint64(0x100000001B3) + b)
        return t.append_column("__part", pa.array((h % np.uint64(256)).astype(np.int64)))

    return (
        pairs.map_batches(pair_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedup, batch_format="pandas")
    )
