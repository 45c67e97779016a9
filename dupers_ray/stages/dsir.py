"""DSIR-style importance weighting and resampling over hashed n-gram
features — select raw-corpus documents whose token distribution matches
a TARGET subset.

The published method (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): featurize every document into
hashed n-gram bucket counts, fit bucket unigram distributions p (target)
and q (raw), weight each raw document by its importance log-ratio
sum_tokens log(p_b/q_b), then resample by weight. This module is the
integer-exact adaptation of that recipe (the gopher_rules /
quality_score precedent): bucket probabilities are Laplace-smoothed
FIXED-POINT parts-per-million, and the per-token coefficient is the
ppm DIFFERENCE a_b = ppm(p_b) - ppm(q_b) rather than a float
log-ratio — monotone in the same direction for the over/under-
represented buckets that drive selection, and every value is an int64
the driver oracle can hash-compare exactly. (Swap `_coefficients` for
float log-ratios in production; the Ray plumbing is unchanged.)

Scale shape (the whole point at 100 TB):
1. ONE streaming pass computes BOTH distributions: per batch, tokens
   are interned (dictionary_encode), md5-hashed per distinct token into
   ``dim`` buckets, and partial (bucket, cnt_raw, cnt_target) rows are
   emitted — at most ``dim`` rows per batch regardless of batch bytes
   (the pre-aggregated combiner idiom). The groupby that merges them
   shuffles <= dim distinct keys.
2. The coefficient vector (dim int64s, ~32 KB) is computed driver-side
   with Python ints (no overflow at any corpus size) and broadcast via
   ``ray.put`` — read once per task, never re-shipped per batch.
3. Scoring is a second stateless pass: per-doc score = one bincount
   dot, exactly quality_score's kernel.
4. Top-k selection never global-sorts: a per-batch partial top-k
   combiner bounds what leaves each block at k rows, and the driver
   merges n_blocks * k tiny rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.functions.hashing import hash_str_u64

DIM = 4096           # hashed feature buckets
PPM = 1_000_000      # fixed-point probability scale


def bucket_count_table(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    target_col: str = "source",
    target_value: str = "src0",
    dim: int = DIM,
) -> "ray.data.Dataset":
    """(bucket, cnt_raw, cnt_target) token-occurrence counts over the
    corpus in ONE pass; cnt_target counts only docs whose
    ``target_col == target_value``. At most ``dim`` rows leave each
    batch; the merging groupby shuffles <= dim keys."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from dupers_ray.stages.textstats import flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_idx, n = flat_tokens(t.column(text_col))
        if not len(flat):
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "cnt_raw": pa.array([], pa.int64()),
                "cnt_target": pa.array([], pa.int64()),
            })
        enc = flat.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bk = (
            hash_str_u64(enc.dictionary.to_pylist()) % np.uint64(dim)
        ).astype(np.int64)[inv]
        is_tgt = pc.equal(
            t.column(target_col), target_value
        ).to_numpy(zero_copy_only=False).astype(bool)
        raw = np.bincount(bk, minlength=dim)
        tgt = np.bincount(bk[is_tgt[doc_idx]], minlength=dim)
        nz = np.nonzero(raw)[0]
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "cnt_raw": pa.array(raw[nz].astype(np.int64)),
            "cnt_target": pa.array(tgt[nz].astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("cnt_raw", alias_name="cnt_raw"),
                   Sum("cnt_target", alias_name="cnt_target"))
    )


def _coefficients(
    buckets: np.ndarray, cnt_raw: np.ndarray, cnt_target: np.ndarray,
    *, dim: int = DIM,
) -> np.ndarray:
    """int64 coefficient per bucket id 0..dim-1:
    a_b = ppm(p_b) - ppm(q_b) with Laplace-smoothed fixed-point
    probabilities p_b = (n_t[b]+1) / (N_t+dim), q_b likewise over the
    raw counts. Python-int arithmetic — exact at any corpus size (the
    numerators exceed int64 beyond ~10^13 tokens)."""
    n_r = np.zeros(dim, np.int64)
    n_t = np.zeros(dim, np.int64)
    n_r[buckets] = cnt_raw
    n_t[buckets] = cnt_target
    nr_tot = int(n_r.sum()) + dim
    nt_tot = int(n_t.sum()) + dim
    return np.array(
        [
            (int(t + 1) * PPM) // nt_tot - (int(r + 1) * PPM) // nr_tot
            for t, r in zip(n_t.tolist(), n_r.tolist())
        ],
        np.int64,
    )


def dsir_weights(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "source",
    target_value: str = "src0",
    dim: int = DIM,
) -> "ray.data.Dataset":
    """Per doc: (id, n_tokens, score) where score is the integer DSIR
    importance weight sum_tokens a_bucket(token). Two streaming passes
    over the corpus (counts, then scoring with the broadcast coefficient
    vector); empty/null docs score 0."""
    cnt = bucket_count_table(
        ds, text_col=text_col, target_col=target_col,
        target_value=target_value, dim=dim,
    ).take_all()  # <= dim rows by construction
    coef = _coefficients(
        np.array([r["bucket"] for r in cnt], np.int64),
        np.array([r["cnt_raw"] for r in cnt], np.int64),
        np.array([r["cnt_target"] for r in cnt], np.int64),
        dim=dim,
    )
    coef_ref = ray.put(coef)

    from dupers_ray.stages.textstats import flat_tokens

    def score(t: pa.Table) -> pa.Table:
        a = ray.get(coef_ref)
        flat, doc_idx, n = flat_tokens(t.column(text_col))
        n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            bk = (
                hash_str_u64(enc.dictionary.to_pylist()) % np.uint64(dim)
            ).astype(np.int64)
            # float64 bincount sums exact for |score| < 2^53 (|a| <= 1e6,
            # so safe below ~10^9 tokens/doc)
            sc = np.bincount(
                doc_idx, weights=a[bk][inv].astype(np.float64), minlength=n
            ).astype(np.int64)
        else:
            sc = np.zeros(n, np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "score": pa.array(sc),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_topk(
    weights: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    k: int = 50,
) -> pa.Table:
    """Top-k docs by (score DESC, id ASC) — the deterministic selection
    rule (published DSIR resamples with Gumbel noise; hash-seeded Gumbel
    drops in here without changing the plumbing). No global sort: each
    batch forwards at most k rows, the driver merges n_blocks*k rows."""

    def partial_topk(t: pa.Table) -> pa.Table:
        sc = np.asarray(t.column("score"), dtype=np.int64)
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        order = np.lexsort((ids, -sc))[: min(k, len(sc))]
        return t.take(pa.array(order))

    parts = weights.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # <= k rows per block
    if not parts:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        })
    t = pa.Table.from_pylist(parts)
    sc = np.asarray(t.column("score"), dtype=np.int64)
    ids = np.asarray(t.column(id_col), dtype=np.int64)
    order = np.lexsort((ids, -sc))[: min(k, len(t))]
    return t.take(pa.array(order)).select([id_col, "n_tokens", "score"])
