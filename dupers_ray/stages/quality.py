"""Hashed bag-of-words quality scoring (fastText-style linear filter).

Production curation pipelines score every document with a cheap linear
classifier over hashed token features and keep docs above a threshold
(CCNet / Dolma quality filters). The environment has no model files, so
the weight table is DERIVED deterministically from the hash machinery
itself — ``weight(bucket) = splitmix64(bucket) % 201 - 100`` — which
keeps the whole kernel (feature hashing, bucket projection, weight
lookup, dot product) real and value-oracle-able in SQL while standing in
for a trained coefficient vector (swap :func:`_weights` for a learned
``np.load`` in production; the Ray plumbing is unchanged).

Engine-new (the reference has no scoring surface). Integer-exact: score
is a sum of int weights over token OCCURRENCES, so the driver oracle
hash-compares exactly (no float summation order issues).

Scale shape: one stateless streaming pass; per batch the token list is
interned once (``np.unique``) so md5 hashing runs per distinct token,
and per-doc sums are one ``bincount`` — no shuffle, no state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dupers_ray.functions.hashing import hash_str_u64, splitmix64

DIM = 4096          # hashed feature buckets
WEIGHT_SPAN = 201   # weights in [-100, 100]


def _weights(buckets: np.ndarray) -> np.ndarray:
    """int64 weight per bucket id: splitmix64(bucket) % 201 - 100."""
    return (
        (splitmix64(buckets.astype(np.uint64)) % np.uint64(WEIGHT_SPAN))
        .astype(np.int64) - (WEIGHT_SPAN // 2)
    )


def quality_score(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DIM,
) -> pa.Table:
    """Per doc: ``n_tokens``, integer ``score`` (hashed-BoW dot product)
    and ``keep`` (1 if score > 0). Empty/null text scores 0 / keep=0.
    Tokenize + intern are Arrow kernels (flat_tokens + dictionary_encode);
    md5 runs once per DISTINCT token per batch."""
    from dupers_ray.stages.textstats import flat_tokens

    flat, doc_idx, n = flat_tokens(batch.column(text_col))
    n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        w = _weights(
            hash_str_u64(enc.dictionary.to_pylist()) % np.uint64(dim)
        )
        # float64 bincount sums are exact for |score| < 2^53
        score = np.bincount(
            doc_idx, weights=w[inv].astype(np.float64), minlength=n
        ).astype(np.int64)
    else:
        score = np.zeros(n, np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "score": pa.array(score),
            "keep": pa.array((score > 0).astype(np.int64)),
        }
    )


def compression_stats(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> pa.Table:
    """Per-doc DEFLATE compressibility — the classic repetitiveness proxy
    (Gopher/CCNet-class pipelines drop pages that compress too well;
    boilerplate and keyword-stuffing compress far below prose's ~2.5-4x).

    Emits integer columns only: n_raw_bytes, n_deflate_bytes, and
    ``deflate_ppm`` = compressed/raw in parts-per-million (0 for empty
    docs) — float-free, bit-identical at any partitioning. zlib is
    deterministic for a fixed level, so tests pin exact values. The
    per-row loop is inherent (zlib owns the C loop per document, the
    same contract as the sha256 digest stage). NOT SQL-expressible —
    the driver records a rows-only check; pytest value-checks against
    direct zlib instead."""
    import zlib

    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    raw = np.empty(n, np.int64)
    comp = np.empty(n, np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, level)) if b else 0
    ppm = np.where(raw > 0, comp * 1_000_000 // np.maximum(1, raw), 0)
    return pa.table({
        id_col: batch.column(id_col),
        "n_raw_bytes": pa.array(raw),
        "n_deflate_bytes": pa.array(comp),
        "deflate_ppm": pa.array(ppm.astype(np.int64)),
    })


# ------------------------------------------------------- Gopher page rules

# Integer-exact adaptation of the Gopher rule-based page filters (Rae et
# al. 2021, table A1 — the subset whose signals exist in a text-only
# corpus; reused by Dolma/RefinedWeb/FineWeb-class pipelines). Mean-word-
# length and alpha-fraction thresholds are cross-multiplied so every
# comparison stays in int64 and the driver oracle hash-compares exactly.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3    # 3 <= sum_len / n  <=>  3*n <= sum_len
GOPHER_MAX_MEAN_LEN = 10
GOPHER_ALPHA_NUM = 8       # n_alpha / n >= 0.8  <=>  10*n_alpha >= 8*n
GOPHER_ALPHA_DEN = 10
GOPHER_MIN_STOP_HITS = 2


def gopher_rules(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Per doc: integer rule signals + ``keep`` (1 iff every rule passes).

    Signals over the lowercased ``\\w+`` token stream:
    n_words, sum_word_len, n_alpha_words (>=1 ascii letter),
    n_stop_hits (occurrences of the en stopword table — the same table
    that generates the lang_id oracle, so they cannot drift).

    One stateless streaming pass, no shuffle: tokenize + intern are Arrow
    kernels (flat_tokens + dictionary_encode); per-doc sums are single
    bincounts; the length/stopword/alpha tests run once per DISTINCT
    token via Arrow kernels over the dictionary."""
    import pyarrow.compute as pc

    from dupers_ray.stages.textstats import _STOPWORDS, flat_tokens

    flat, doc_idx, n = flat_tokens(batch.column(text_col))
    n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u_len = pc.utf8_length(enc.dictionary).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        u_alpha = pc.match_substring_regex(
            enc.dictionary, "[a-z]"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        u_stop = pc.is_in(
            enc.dictionary,
            value_set=pa.array(sorted(_STOPWORDS["en"]), pa.string()),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sum_len = np.bincount(doc_idx, weights=u_len[inv], minlength=n).astype(np.int64)
        n_alpha = np.bincount(doc_idx, weights=u_alpha[inv], minlength=n).astype(np.int64)
        n_stop = np.bincount(doc_idx, weights=u_stop[inv], minlength=n).astype(np.int64)
    else:
        sum_len = np.zeros(n, np.int64)
        n_alpha = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)

    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (GOPHER_MIN_MEAN_LEN * n_words <= sum_len)
        & (sum_len <= GOPHER_MAX_MEAN_LEN * n_words)
        & (GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * n_words)
        & (n_stop >= GOPHER_MIN_STOP_HITS)
    ).astype(np.int64)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words),
            "sum_word_len": pa.array(sum_len),
            "n_alpha_words": pa.array(n_alpha),
            "n_stop_hits": pa.array(n_stop),
            "keep": pa.array(keep),
        }
    )


def train_bow_perceptron(
    ds: "ray.data.Dataset",
    *,
    label_col: str,
    text_col: str = "text",
    dim: int = DIM,
    iters: int = 2,
) -> "ray.data.Dataset":
    """Distributed BATCH-perceptron training over hashed bag-of-words —
    the quality-classifier TRAINING step (the fastText-style filter of
    CCNet/GPT-3 data prep, reduced to its deterministic integer core).
    Labels are ±1; features are token counts hashed into ``dim`` buckets
    (md5-u64 % dim, the same family as :func:`quality_score`). Per
    iteration, every doc with margin ``y·(w·x) <= 0`` contributes
    ``y·x`` to the gradient and ``w += Σ gradient`` — the batch (not
    sequential) perceptron, so partial sums commute: the result is
    EXACTLY layout-invariant and, being all-integer, bit-reproducible.

    Scale shape, per iteration: weights (8·dim bytes) broadcast once via
    ``ray.put``; one streaming corpus pass emits per-batch partial
    gradients (≤ dim rows, int64); one ≤dim-row groupby + a driver add.
    K passes over the corpus total — the distributed-Lloyd pattern
    (semdedup.py) applied to a linear model. Output: (dim_id, weight),
    nonzero rows only. SQL oracle: the K=2 unrolled CTE chain — see
    __ray_entry__.py (iterative training restated exactly because every
    step is a grouped integer sum)."""
    import ray as _ray

    from dupers_ray.stages.textstats import flat_tokens

    if iters < 1:
        raise ValueError("iters must be >= 1")
    w = np.zeros(dim, np.int64)
    src = ds.select_columns([label_col, text_col])

    for _ in range(iters):
        wref = _ray.put(w)

        def grad(t: pa.Table) -> pa.Table:
            y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            flat, doc_idx, n = flat_tokens(t.column(text_col))
            empty = pa.table({
                "dim_id": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
            })
            if not len(flat):
                return empty
            enc = flat.dictionary_encode()
            inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            bkt = (
                hash_str_u64(enc.dictionary.to_pylist()) % np.uint64(dim)
            ).astype(np.int64)[inv]
            wv = _ray.get(wref)
            # float64 bincount sums exact for |score| < 2^53
            score = np.bincount(
                doc_idx, weights=wv[bkt].astype(np.float64), minlength=n
            ).astype(np.int64)
            miss = (y * score) <= 0
            sel = miss[doc_idx]
            if not sel.any():
                return empty
            g = np.bincount(
                bkt[sel], weights=y[doc_idx][sel].astype(np.float64),
                minlength=dim,
            ).astype(np.int64)
            nz = np.flatnonzero(g)
            return pa.table({
                "dim_id": pa.array(nz.astype(np.int64)),
                "g": pa.array(g[nz]),
            })

        def fold(t: pa.Table) -> pa.Table:
            d = np.asarray(t.column("dim_id"), dtype=np.int64)
            g = np.asarray(t.column("g"), dtype=np.int64)
            tot = np.bincount(d, weights=g, minlength=dim).astype(np.int64)
            nz = np.flatnonzero(tot)
            return pa.table({
                "dim_id": pa.array(nz.astype(np.int64)),
                "g": pa.array(tot[nz]),
            })

        # tree fold instead of a keyed groupby: the sparse partials are
        # <= dim rows per batch, so a plain repartition + in-block
        # bincount collapses them without paying the sort AllToAll's
        # per-input-block scheduling (measured 18 s -> ~6 s per pass at
        # 224 read blocks); the final <= ncpu x dim rows fold on the
        # driver is the PageRank rank-vector regime (linkgraph.py)
        parts = (
            src.map_batches(grad, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(8)
            .map_batches(fold, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        w = w.copy()
        for r in parts:
            w[int(r["dim_id"])] += int(r["g"])

    import ray.data as rd

    nz = np.flatnonzero(w)
    return rd.from_arrow(pa.table({
        "dim_id": pa.array(nz.astype(np.int64)),
        "weight": pa.array(w[nz]),
    }))


def score_with_bow_weights(
    ds: "ray.data.Dataset",
    weights: "ray.data.Dataset | pa.Table",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DIM,
) -> "ray.data.Dataset":
    """Apply a trained (dim_id, weight) table (train_bow_perceptron) to
    the corpus: per doc the integer hashed-BoW score under the LEARNED
    weights and ``pred`` = sign(score) ∈ {-1, 0, +1} (0 = token-less or
    exactly-on-boundary). The weight table is dense-ified once on the
    driver (≤ dim rows) and broadcast; ONE streaming corpus pass."""
    import ray as _ray

    from dupers_ray.stages.textstats import flat_tokens

    wt = weights.to_pandas() if hasattr(weights, "to_pandas") else weights
    if isinstance(wt, pa.Table):
        wt = wt.to_pandas()
    w = np.zeros(dim, np.int64)
    w[wt["dim_id"].to_numpy(np.int64)] = wt["weight"].to_numpy(np.int64)
    wref = _ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        flat, doc_idx, n = flat_tokens(t.column(text_col))
        if len(flat):
            enc = flat.dictionary_encode()
            inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            bkt = (
                hash_str_u64(enc.dictionary.to_pylist()) % np.uint64(dim)
            ).astype(np.int64)[inv]
            wv = _ray.get(wref)
            s = np.bincount(
                doc_idx, weights=wv[bkt].astype(np.float64), minlength=n
            ).astype(np.int64)
        else:
            s = np.zeros(n, np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "score": pa.array(s),
            "pred": pa.array(np.sign(s).astype(np.int64)),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
