"""Inverted token index: build once, answer whole-token queries by
reading only the index partitions the query terms live in.

This is the reference's search scale story taken to its conclusion:
dupers' ``search`` linearly scans every key per query
(pkg/database/database.go:373-447); stages/suffix.py amortizes many
terms over one scan; the inverted index amortizes many QUERIES over one
build — the standard trade for a 100 TB corpus queried repeatedly.

Ray-Data shape:
- build: per-batch distinct (token-hash, doc-id) postings (combiner —
  a doc lives in exactly one batch, so per-batch distinct is globally
  distinct) → hive-partitioned parquet by ``part = hash % P`` — the
  partition layout IS the query pruning structure, and the write is
  resumable/append-safe like every other partitioned sink here;
- query: terms hash → only ``len({h % P})`` partition DIRECTORIES are
  read (prune at the read — a 2-term query touches ≤ 2/P of the index
  bytes), an ``is_in`` kernel drops colliding hashes inside those
  partitions, and AND semantics reduce to a per-doc posting count ==
  n_terms (one tiny groupby of matched postings).
Token identity is the md5-fold u64 (functions/hashing.hash_str_u64)
viewed as int64 for parquet/groupby friendliness.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from dupers_ray.functions.hashing import hash_str_u64

DEFAULT_PARTITIONS = 64


def _postings(t: pa.Table, *, id_col: str, text_col: str, partitions: int) -> pa.Table:
    from dupers_ray.stages.lmstats import _doc_tokens

    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    # md5 per DISTINCT token (factorize interning inside _doc_tokens)
    th, lens = _doc_tokens(t.column(text_col), ids)
    doc_idx = np.repeat(np.arange(len(ids)), lens)
    if len(th):
        order = np.lexsort((th, doc_idx))
        d_, h_ = doc_idx[order], th[order]
        new = np.r_[True, (d_[1:] != d_[:-1]) | (h_[1:] != h_[:-1])]
        d_, h_ = d_[new], h_[new]
    else:
        d_, h_ = np.empty(0, np.int64), np.empty(0, np.uint64)
    return pa.table({
        "th": pa.array(h_.view(np.int64)),
        id_col: pa.array(ids[d_]),
        "part": pa.array((h_ % np.uint64(partitions)).astype(np.int64)),
    })


def build_token_index(
    ds: "rd.Dataset",
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    partitions: int = DEFAULT_PARTITIONS,
) -> None:
    """Write the (token-hash, doc-id) posting table hive-partitioned by
    ``part = hash % partitions`` under ``out_dir``."""
    ds.select_columns([id_col, text_col]).map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "partitions": partitions},
    ).write_parquet(out_dir, partition_cols=["part"])


def indexed_token_search(
    index_dir: str,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    mode: str = "all",
    partitions: int = DEFAULT_PARTITIONS,
) -> "rd.Dataset":
    """Docs whose token set contains ALL (``mode="all"``) or ANY
    (``mode="any"``) of ``terms`` — reading only the query terms' index
    partitions. Output: one ``id_col`` row per matching doc."""
    if mode not in ("all", "any"):
        raise ValueError(f"unknown mode: {mode!r}")
    terms = sorted(set(terms))
    th = hash_str_u64(terms).view(np.int64)
    parts = sorted({int(h) for h in (th.view(np.uint64) % np.uint64(partitions))})
    # expand to files: read_parquet accepts one root dir OR a file list,
    # not a list of directories
    import glob

    paths = [
        f
        for p in parts
        for f in sorted(glob.glob(os.path.join(index_dir, f"part={p}", "*.parquet")))
    ]
    if not paths or not len(th):
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
    ds = rd.read_parquet(paths, columns=["th", id_col])
    need = pa.array(th)

    def match(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("th"), value_set=need))
        # per-batch combiner: postings are globally distinct, so count
        # matched terms per doc inside the batch
        g = t.group_by([id_col]).aggregate([("th", "count")])
        return g.rename_columns([id_col, "n_hit"])

    hits = ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
    agg = hits.groupby(id_col).sum("n_hit")
    want = len(terms)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("sum(n_hit)")
        mask = pc.greater_equal(n, 1) if mode == "any" else pc.equal(n, want)
        return pa.table({id_col: t.column(id_col).filter(mask)})

    return agg.map_batches(finish, batch_format="pyarrow")
