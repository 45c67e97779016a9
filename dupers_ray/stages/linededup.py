"""Cross-document line-level boilerplate removal (CCNet-style).

Web corpora repeat whole lines across pages (nav bars, cookie banners,
license footers); CCNet-style curation drops any line that occurs in at
least ``min_docs`` distinct documents. Engine-new — the reference
(bengarrett/dupers) dedups whole files only (pkg/dupe/dupe.go:919-931);
this is the sub-document analogue its digest index cannot express.

The corpus tables carry single-line text, so a "line" here is a fixed
``tokens_per_line``-token chunk of the single-space-split token stream —
deterministic and exactly restatable in SQL (``string_split(text, ' ')``
+ 1-based list slices), which gives the driver query a FULL value oracle
on the cleaned text itself.

Scale shape (two streaming passes, no joins):

1. :func:`frequent_lines` — per-batch combiner: chunk + hash each doc's
   lines (md5-u64, the SQL-restatable family), distinct within doc,
   ``np.unique``-count within batch, emit (line_hash, n_docs) rows. One
   small groupby of pre-combined count rows (docs never split across
   rows, so batch-level distinct-doc counts SUM to the global distinct
   count); the ``>= min_docs`` survivors are the boilerplate set — tiny
   by construction (8 B per frequent line on the driver).
2. :func:`remove_duplicate_lines` — the frequent set is ``ray.put``
   once; every corpus batch re-chunks, tests membership with one
   vectorized ``searchsorted``, and rejoins the kept chunks. ONE
   streaming corpus pass, no shuffle of text bytes.

Hash collisions (md5-u64 across distinct line strings) could remove a
rare line aliasing a frequent one — birthday-bound ~1e-9 even at 10^10
distinct lines per batch-count; the SQL oracle compares exact strings,
so a collision would surface as a driver mismatch rather than hide.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from dupers_ray.functions.hashing import hash_str_u64


def _doc_lines(
    texts: list[str | None], tokens_per_line: int
) -> list[list[str]]:
    """Per-doc chunk strings. Split on a SINGLE space (SQL
    ``string_split(text, ' ')`` parity — not ``str.split()``, which
    collapses runs); empty/null text yields the one-element [''] list,
    exactly as SQL does."""
    w = tokens_per_line
    out = []
    for t in texts:
        toks = (t or "").split(" ")
        out.append(
            [" ".join(toks[i: i + w]) for i in range(0, len(toks), w)]
        )
    return out


def _line_hashes(lines: list[list[str]]) -> list[np.ndarray]:
    """Per-doc DISTINCT chunk hashes (uint64, sorted by np.unique)."""
    return [
        np.unique(hash_str_u64(ls)) if ls else np.empty(0, np.uint64)
        for ls in lines
    ]


def frequent_lines(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    tokens_per_line: int = 10,
    min_docs: int = 2,
) -> np.ndarray:
    """Sorted uint64 hashes of every line occurring in >= ``min_docs``
    distinct documents. Driver-side array — bounded by the boilerplate
    set, not the corpus; raise ``min_docs`` if a corpus's repeated-line
    tail is too fat to hold."""

    def per_batch(t: pa.Table) -> pa.Table:
        hs = _line_hashes(
            _doc_lines(t.column(text_col).to_pylist(), tokens_per_line)
        )
        flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        u, n = np.unique(flat, return_counts=True)
        return pa.table(
            {
                # int64 view: uint64 groupby keys above 2^63 fall into
                # Ray's pickled-object path (BASELINE.md notes)
                "lh": pa.array(u.view(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    counts = docs.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lh").aggregate(Sum("n", alias_name="n"))
    freq = counts.filter(
        expr=f"n >= {int(min_docs)}"
    ).select_columns(["lh"]).to_pandas()  # column pull, not per-row take_all
    if not len(freq):
        return np.empty(0, np.uint64)
    return np.sort(freq["lh"].to_numpy(np.int64).view(np.uint64))


def frequent_lines_by_key(
    docs: "ray.data.Dataset",
    *,
    key_col: str = "source",
    text_col: str = "text",
    tokens_per_line: int = 10,
    min_docs: int = 2,
) -> np.ndarray:
    """Per-HOST frequent lines: sorted uint64 hashes of every
    (key, line) pair where the line occurs in >= ``min_docs`` distinct
    documents OF THE SAME ``key_col`` value (host/domain/source).

    The pair is folded into ONE u64 — ``hash(key + \\x1e + line)`` — so
    the frequent set stays a single sorted array (same broadcast shape,
    searchsorted membership and collision bound as the global
    :func:`frequent_lines`); no per-host dict, no string keys in the
    groupby. The \\x1e separator cannot occur in the single-space token
    chunks, so distinct (key, line) pairs map to distinct preimages."""

    def per_batch(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        lines = _doc_lines(t.column(text_col).to_pylist(), tokens_per_line)
        per_doc = [
            np.unique(hash_str_u64([f"{k}\x1e{ln}" for ln in ls]))
            if ls else np.empty(0, np.uint64)
            for k, ls in zip(keys, lines)
        ]
        flat = (
            np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
        )
        u, n = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "lh": pa.array(u.view(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    counts = docs.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("lh").aggregate(Sum("n", alias_name="n"))
    freq = counts.filter(
        expr=f"n >= {int(min_docs)}"
    ).select_columns(["lh"]).to_pandas()
    if not len(freq):
        return np.empty(0, np.uint64)
    return np.sort(freq["lh"].to_numpy(np.int64).view(np.uint64))


def remove_host_boilerplate(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str = "source",
    tokens_per_line: int = 10,
    min_docs: int = 2,
) -> "ray.data.Dataset":
    """Host-scoped boilerplate removal: drop a line from a page only when
    it repeats across >= ``min_docs`` documents of the SAME host — nav
    bars and footers are per-site templates, and host scoping keeps a
    sentence legitimately shared across different sites (a quote, a
    spec) intact where the global :func:`remove_duplicate_lines` would
    strip it. Engine-new vs the reference (whole-file digests only,
    pkg/dupe/dupe.go:919-931); the per-host refinement of CCNet-style
    line dedup. Output per doc: (id, n_lines, n_removed, clean_text)."""
    freq = frequent_lines_by_key(
        docs, key_col=key_col, text_col=text_col,
        tokens_per_line=tokens_per_line, min_docs=min_docs,
    )
    ref = ray.put(freq)

    def clean(t: pa.Table) -> pa.Table:
        block = ray.get(ref)
        keys = t.column(key_col).to_pylist()
        lines = _doc_lines(t.column(text_col).to_pylist(), tokens_per_line)
        n_lines = np.fromiter((len(ls) for ls in lines), np.int64, len(lines))
        n_removed = np.zeros(len(lines), np.int64)
        texts = []
        for i, (k, ls) in enumerate(zip(keys, lines)):
            if len(block) and ls:
                h = hash_str_u64([f"{k}\x1e{ln}" for ln in ls])
                pos = np.searchsorted(block, h).clip(0, len(block) - 1)
                drop = block[pos] == h
                n_removed[i] = int(drop.sum())
                texts.append(
                    " ".join(s for s, d in zip(ls, drop) if not d)
                )
            else:
                texts.append(" ".join(ls))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_lines": pa.array(n_lines),
                "n_removed": pa.array(n_removed),
                "clean_text": pa.array(texts, pa.string()),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def remove_duplicate_lines(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 10,
    min_docs: int = 2,
) -> "ray.data.Dataset":
    """Per doc: ``n_lines``, ``n_removed`` and ``clean_text`` with every
    cross-document frequent line dropped (kept chunks rejoined with a
    single space, preserving order)."""
    freq = frequent_lines(
        docs, text_col=text_col,
        tokens_per_line=tokens_per_line, min_docs=min_docs,
    )
    ref = ray.put(freq)

    def clean(t: pa.Table) -> pa.Table:
        block = ray.get(ref)
        lines = _doc_lines(t.column(text_col).to_pylist(), tokens_per_line)
        n_lines = np.fromiter((len(ls) for ls in lines), np.int64, len(lines))
        n_removed = np.zeros(len(lines), np.int64)
        texts = []
        for i, ls in enumerate(lines):
            if len(block) and ls:
                h = hash_str_u64(ls)
                pos = np.searchsorted(block, h).clip(0, len(block) - 1)
                drop = block[pos] == h
                n_removed[i] = int(drop.sum())
                texts.append(
                    " ".join(s for s, d in zip(ls, drop) if not d)
                )
            else:
                texts.append(" ".join(ls))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_lines": pa.array(n_lines),
                "n_removed": pa.array(n_removed),
                "clean_text": pa.array(texts, pa.string()),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
