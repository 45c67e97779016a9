"""Suffix-array substring containment — the scaled `search` (north rule).

The reference's `search` is a linear ``bytes.Contains`` scan of every key
(pkg/database/database.go:397-447). A vectorized scan (pipelines/search.py)
parallelizes that; this stage goes further for MANY-term workloads: each
partition builds ONE suffix array over its concatenated text and answers
every term by binary search — O(|partition|) build (amortized), then
O(|term| · log n) per term instead of O(|partition|) per term.

Build: prefix-doubling (Manber–Myers, O(n log² n)) in pure numpy.
``SuffixIndexSearcher`` is the per-batch stage (SURVEY.md ST3): terms are
broadcast once (ray.put in the driver wrapper), the SA is built per batch
in ``__call__`` — amortized over all terms. Partition-level SAs over
sorted corpora are the multi-node extension (the partitioning assumption:
a doc's text lives wholly inside one partition — guaranteed here because
concatenation happens within the batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def build_suffix_array(data: bytes) -> np.ndarray:
    """Suffix array of ``data`` (int64 positions, lexicographic order) by
    prefix doubling — numpy lexsort per round, O(n log^2 n)."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.int64)
    rank = np.frombuffer(data, np.uint8).astype(np.int64)
    k = 1
    idx = np.arange(n, dtype=np.int64)
    while True:
        rank2 = np.full(n, -1, np.int64)
        if k < n:
            rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        new = np.empty(n, np.int64)
        changed = (rank[order][1:] != rank[order][:-1]) | (
            rank2[order][1:] != rank2[order][:-1]
        )
        new[order] = np.concatenate(([0], np.cumsum(changed)))
        rank = new
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _sa_contains(data: bytes, sa: np.ndarray, term: bytes) -> np.ndarray:
    """All positions where ``term`` occurs, via two binary searches on the
    suffix array (O(|term| log n) comparisons)."""
    n = len(sa)
    if n == 0 or not term:
        return np.empty(0, np.int64)
    tl = len(term)

    def suffix_cmp_lt(pos: int, t: bytes) -> bool:
        return data[pos : pos + tl] < t

    lo, hi = 0, n
    while lo < hi:  # first suffix >= term
        mid = (lo + hi) // 2
        if suffix_cmp_lt(int(sa[mid]), term):
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = n
    while lo < hi:  # first suffix with prefix > term
        mid = (lo + hi) // 2
        if data[int(sa[mid]) : int(sa[mid]) + tl] <= term:
            lo = mid + 1
        else:
            hi = mid
    return np.sort(sa[start:lo])


class SuffixIndexSearcher:
    """Per-batch stage: builds one SA over the batch's concatenated text
    (docs separated by \\x00, which never appears in utf-8 text) and
    answers every term. Output rows: (term, id) per containing doc."""

    def __init__(self, terms_ref, *, id_col: str = "url", text_col: str = "text"):
        self.terms: list[str] = ray.get(terms_ref) if not isinstance(
            terms_ref, list
        ) else terms_ref
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = [(t or "") for t in batch.column(self.text_col).to_pylist()]
        enc = [t.encode("utf-8") for t in texts]
        blob = b"\x00".join(enc)
        sa = build_suffix_array(blob)
        # doc boundary table: start offset of each doc in blob
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(e) + 1 for e in enc], out=offsets[1:])
        out_term: list[str] = []
        out_id: list = []
        for term in self.terms:
            tb = term.encode("utf-8")
            pos = _sa_contains(blob, sa, tb)
            if len(pos) == 0:
                continue
            docs = np.searchsorted(offsets, pos, side="right") - 1
            # exclude matches spanning the \x00 separator: occurrence must
            # end within the same doc
            ok = pos + len(tb) <= offsets[docs] + np.array([len(enc[d]) for d in docs])
            hit_docs = np.unique(docs[ok])
            out_term.extend([term] * len(hit_docs))
            out_id.extend(ids[int(d)] for d in hit_docs)
        return pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                self.id_col: pa.array(
                    out_id, batch.schema.field(self.id_col).type
                ),
            }
        )


def multi_term_search(
    ds: "ray.data.Dataset",
    terms: list[str],
    *,
    id_col: str = "url",
    text_col: str = "text",
    batch_size: int = 2048,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """(term, id) rows for every (term, doc-containing-term) combination.
    Terms broadcast once via ray.put; SA amortizes across terms."""
    ref = ray.put(list(terms))
    return ds.select_columns([id_col, text_col]).map_batches(
        SuffixIndexSearcher,
        fn_constructor_kwargs={"terms_ref": ref, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
