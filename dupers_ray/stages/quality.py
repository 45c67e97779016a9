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
from dupers_ray.stages.textstats import _TOKEN_RE

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
    and ``keep`` (1 if score > 0). Empty/null text scores 0 / keep=0."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    toks: list[str] = []
    doc_of: list[int] = []
    for i, t in enumerate(texts):
        tt = _TOKEN_RE.findall((t or "").lower())
        toks.extend(tt)
        doc_of.extend([i] * len(tt))
    doc_idx = np.asarray(doc_of, dtype=np.int64)
    n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)
    if toks:
        uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        w = _weights(hash_str_u64(list(uniq)) % np.uint64(dim))
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
