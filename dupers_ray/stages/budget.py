"""Global ordered prefix selection — "take docs in a deterministic
uniform-random order until a token budget is met".

The training-data use case: corpus subsetting to a fixed token budget
(e.g. "500 B tokens for this mixture slice") must be deterministic,
resumable, and identical at any parallelism. That needs a GLOBAL running
sum in a total order — the one aggregate Ray Data has no primitive for.

Scale shape (NO full sort, no driver-side corpus):

1. one stateless pass: per doc, ``n_tokens`` and a uniform order key
   ``splitmix64(id)`` (a bijection — no ties); ``bucket`` = the key's top
   bits, so bucket ranges partition the total order: every key in bucket
   b sorts before every key in bucket b+1.
2. per-batch combiner → one tiny groupby: per-bucket token totals
   (``n_buckets`` rows — driver-safe by construction).
3. the driver prefix-sums the bucket totals (n_buckets adds) and
   broadcasts the per-bucket offsets once via ``ray.put``.
4. one shuffle of the compact stats rows (id, n_tokens, key, bucket ≈
   32 B/doc — never the text) groups each bucket; within a bucket the
   rows sort locally and cumsum + their bucket offset = the exact global
   running total, so ``selected = cum_tokens <= budget`` is reproducible
   at any block layout.

Equivalent SQL (the driver oracle): ``sum(n_tokens) OVER (ORDER BY
splitmix64(id), id)`` with a threshold — an ordered window over the
whole corpus, which a single-node engine can afford and the distributed
plan reproduces bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.functions.hashing import splitmix64
from dupers_ray.stages.textstats import _TOKEN_RE

DEFAULT_N_BUCKETS = 4096


def select_token_budget(
    ds: "ray.data.Dataset",
    *,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> "ray.data.Dataset":
    """(id, n_tokens, cum_tokens, selected): global running token total in
    splitmix64(id) order; ``selected=1`` while ``cum_tokens <= budget``.

    ``n_buckets`` bounds both the driver table (one row per bucket) and
    the per-group sort (corpus/n_buckets rows); raise it for corpora
    where a 1/n_buckets slice outgrows a worker's heap."""
    shift = np.uint64(64 - int(np.log2(n_buckets)))
    if (1 << int(np.uint64(64) - shift)) != n_buckets:
        raise ValueError("n_buckets must be a power of two")

    def stats(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column(text_col).to_pylist()
        n_tok = np.fromiter(
            (len(_TOKEN_RE.findall((s or "").lower())) for s in texts),
            np.int64, len(texts),
        )
        key = splitmix64(ids.view(np.uint64))
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n_tok),
            # int64 views keep Ray's groupby in native-block land
            "__key": pa.array(key.view(np.int64)),
            "__bucket": pa.array((key >> shift).astype(np.int64)),
        })

    compact = ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice: bucket totals + the grouped pass

    # per-batch combiner, then a groupby of n_buckets partial rows
    def partial(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("__bucket"), dtype=np.int64)
        n = np.asarray(t.column("n_tokens"), dtype=np.int64)
        tot = np.bincount(b, weights=n, minlength=0).astype(np.int64)
        nz = np.flatnonzero(tot)
        return pa.table({"__bucket": pa.array(nz), "t": pa.array(tot[nz])})

    from ray.data.aggregate import Sum

    totals = (
        compact.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .aggregate(Sum("t", alias_name="t"))
        .take_all()
    )  # <= n_buckets rows by construction
    offsets = np.zeros(n_buckets, np.int64)
    for r in totals:
        offsets[int(r["__bucket"])] = int(r["t"])
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])
    oref = ray.put(offsets)

    def resolve(g: pa.Table) -> pa.Table:
        offs = ray.get(oref)
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        n = np.asarray(g.column("n_tokens"), dtype=np.int64)
        key = np.asarray(g.column("__key"), dtype=np.int64).view(np.uint64)
        bkt = int(g.column("__bucket")[0].as_py())
        order = np.lexsort((ids, key))
        cum = np.cumsum(n[order]) + offs[bkt]
        sel = (cum <= budget).astype(np.int64)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n),
            "cum_tokens": pa.array(cum[inv]),
            "selected": pa.array(sel[inv]),
        })

    return compact.groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
