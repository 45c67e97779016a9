"""Decontamination: drop corpus documents sharing any word-k-gram with a
blocklist corpus (benchmark test sets, held-out evals).

The standard training-data hygiene op (C4/Dolma-style n-gram overlap
removal); engine-new — the reference dedups within one corpus only.
Shingle semantics are exactly ``stages/ngram.shingle_set`` (lowercased
``[a-z0-9_]+`` tokens, unit-separator-joined k-windows, whole-text
shingle for <k-token docs, no shingles for empty docs ⇒ empty docs are
never contaminated), hashed with the SQL-restatable md5-u64 family so
the driver can value-oracle the result.

Two strategies, mirroring near_dedup's verify switch:

- ``broadcast`` (default): the blocklist's distinct shingle hashes are
  collected, sorted, ``ray.put`` once, and every corpus batch runs a
  vectorized ``searchsorted`` membership test — ONE streaming pass over
  the corpus, no shuffle. Right for real decontamination: test sets are
  MBs while the corpus is TBs (~8 bytes per distinct blocklist shingle
  in every worker's plasma view).
- ``join``: corpus (shingle, id) rows shuffle against blocklist shingle
  rows via the cogroup join; contaminated ids come back tiny and filter
  the corpus by broadcast. For blocklists too big to hold in memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.functions.hashing import hash_str_u64
from dupers_ray.stages.ngram import shingle_set

_US = "\x1f"


def _shingle_hashes(texts: list[str | None], k: int) -> list[np.ndarray]:
    """Per-doc DISTINCT shingle hashes (uint64)."""
    out = []
    for t in texts:
        grams = sorted(_US.join(g) for g in shingle_set(t or "", k))
        out.append(
            hash_str_u64(grams) if grams else np.empty(0, np.uint64)
        )
    return out


def blocklist_shingles(
    blocklist: "ray.data.Dataset", *, text_col: str = "text", k: int = 5,
) -> np.ndarray:
    """Sorted distinct shingle hashes of the blocklist corpus (driver-side
    array — the blocklist is the SMALL side by contract)."""

    def per_batch(t: pa.Table) -> pa.Table:
        hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
        u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
        return pa.table({"sh": pa.array(u)})

    parts = blocklist.map_batches(per_batch, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.array([r["sh"] for r in parts], dtype=np.uint64))


def decontaminate(
    docs: "ray.data.Dataset",
    blocklist: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    strategy: str = "broadcast",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Return ``docs`` minus every document sharing ≥1 k-gram shingle with
    ``blocklist`` (columns pass through unchanged)."""
    if strategy == "broadcast":
        ref = ray.put(blocklist_shingles(blocklist, text_col=text_col, k=k))

        def clean(t: pa.Table) -> pa.Table:
            block = ray.get(ref)
            hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
            keep = np.fromiter(
                (
                    not (
                        len(h)
                        and np.any(
                            block[
                                np.searchsorted(block, h).clip(0, len(block) - 1)
                            ]
                            == h
                        )
                    )
                    if len(block)
                    else True
                    for h in hs
                ),
                bool,
                len(hs),
            )
            return t.filter(pa.array(keep))

        return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

    if strategy == "join":
        from dupers_ray.pipelines.joins import hash_join

        def corpus_shingles(t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column(id_col), dtype=np.int64)
            hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
            counts = np.fromiter((len(h) for h in hs), np.int64, len(hs))
            sh = (np.concatenate(hs) if len(hs) else np.empty(0, np.uint64))
            return pa.table(
                {
                    # int64 view: uint64 keys above 2^63 fall into Ray's
                    # pickled-object path (BASELINE.md notes)
                    "sh": pa.array(sh.view(np.int64)),
                    id_col: pa.array(np.repeat(ids, counts)),
                }
            )

        def block_shingles(t: pa.Table) -> pa.Table:
            hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
            u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
            return pa.table({"sh": pa.array(u.view(np.int64))})

        cs = docs.map_batches(corpus_shingles, batch_format="pyarrow",
                              zero_copy_batch=True)
        bs = blocklist.map_batches(block_shingles, batch_format="pyarrow",
                                   zero_copy_batch=True)
        hits = hash_join(
            cs, bs, on="sh", num_partitions=num_partitions,
            left_schema=pa.schema([("sh", pa.int64()), (id_col, pa.int64())]),
            right_schema=pa.schema([("sh", pa.int64())]),
        )
        bad = np.unique(
            np.array([r[id_col] for r in hits.select_columns([id_col]).take_all()],
                     dtype=np.int64)
        )
        bad_ref = ray.put(bad)

        def drop(t: pa.Table) -> pa.Table:
            b = ray.get(bad_ref)
            ids = np.asarray(t.column(id_col), dtype=np.int64)
            if not len(b):
                return t
            pos = np.searchsorted(b, ids).clip(0, len(b) - 1)
            return t.filter(pa.array(b[pos] != ids))

        return docs.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)

    raise ValueError(f"unknown strategy {strategy!r}")
