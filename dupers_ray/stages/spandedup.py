"""Cross-document duplicate-SPAN removal (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
exact-substring removal op; arXiv:2107.06499).

stages/repetition.dup_ngram_coverage MEASURES duplicated n-grams;
this stage REMOVES them: any token covered by a k-gram that occurs in
``min_docs``+ distinct documents is dropped — except in the gram's
OWNER (min doc_id containing it), which keeps the canonical copy.
That is the reference's keep-first dedup rule (pkg/dupe/dupe.go:919-931)
applied at substring granularity instead of whole files.

Token/gram contract (exactly SQL-restatable, full value oracle):
tokens = single-space split (string_split parity, as linededup);
grams = all k-token windows, joined back with a single space (injective:
tokens contain no spaces); a doc with fewer than k tokens has no grams.
A token is removed iff some dup gram window covers it and the doc is not
that gram's owner. clean_text = kept tokens rejoined in order.

Scale shape = linededup's: pass 1 builds the dup-gram table with a
per-batch combiner (docs are whole rows, so batch-distinct counts SUM to
global distinct-doc counts and batch-min owners MIN to the global
owner) + one groupby of count rows; the (gram_hash, owner) survivor set
is ``ray.put`` once — bounded by the duplicated tail, not the corpus
(raise min_docs / k if a corpus's shared-gram tail is too fat to hold,
or swap the broadcast for a cogroup join as decontam does). Pass 2 is
ONE streaming corpus rewrite with two vectorized searchsorteds and a
diff+cumsum coverage mask per doc. md5-u64 gram hashing as everywhere
(collisions surface as driver-oracle mismatches, not silent data loss).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.functions.hashing import hash_str_u64


def _doc_grams(texts: list[str | None], k: int) -> list[list[str]]:
    """Per-doc k-gram strings (all windows, in start order)."""
    out = []
    for t in texts:
        toks = (t or "").split(" ")
        out.append(
            [" ".join(toks[i: i + k]) for i in range(len(toks) - k + 1)]
        )
    return out


def dup_gram_owners(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_docs: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted uint64 gram hashes, aligned int64 owner ids) for every
    k-gram occurring in >= min_docs distinct documents."""

    def per_batch(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        grams = _doc_grams(t.column(text_col).to_pylist(), k)
        ghs, owners = [], []
        for i, gs in enumerate(grams):
            if gs:
                u = np.unique(hash_str_u64(gs))
                ghs.append(u)
                owners.append(np.full(len(u), ids[i], np.int64))
        if ghs:
            flat = np.concatenate(ghs)
            own = np.concatenate(owners)
            # per-batch combine: distinct-doc count + min owner per gram
            uniq, inv, cnt = np.unique(
                flat, return_inverse=True, return_counts=True)
            mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mn, inv, own)
        else:
            uniq = np.empty(0, np.uint64)
            cnt = np.empty(0, np.int64)
            mn = np.empty(0, np.int64)
        return pa.table({
            "gh": pa.array(uniq.view(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
            "owner": pa.array(mn),
        })

    from dupers_ray.functions.grouping import partitioned_aggregate

    dup = partitioned_aggregate(
        docs.map_batches(
            per_batch, batch_format="pyarrow", zero_copy_batch=True
        ),
        "gh", sums=("n",), mins=("owner",),
        having_sum_ge=int(min_docs), having_col="n",
    ).select_columns(["gh", "owner"]).to_pandas()
    if not len(dup):
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    gh = dup["gh"].to_numpy(np.int64).view(np.uint64)
    owner = dup["owner"].to_numpy(np.int64)
    order = np.argsort(gh, kind="stable")
    return gh[order], owner[order]


def remove_duplicate_spans(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_docs: int = 2,
) -> "ray.data.Dataset":
    """Per doc: ``n_tokens``, ``n_removed`` (tokens dropped) and
    ``clean_text`` with every non-owner duplicate span removed."""
    gh_sorted, owners = dup_gram_owners(
        docs, id_col=id_col, text_col=text_col, k=k, min_docs=min_docs)
    ref = ray.put((gh_sorted, owners))

    def clean(t: pa.Table) -> pa.Table:
        gh, own = ray.get(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        n_tokens = np.empty(len(texts), np.int64)
        n_removed = np.zeros(len(texts), np.int64)
        out_texts: list[str] = []
        for i, txt in enumerate(texts):
            toks = (txt or "").split(" ")
            n = len(toks)
            n_tokens[i] = n
            if n < k or not len(gh):
                out_texts.append(" ".join(toks))
                continue
            gs = [" ".join(toks[s: s + k]) for s in range(n - k + 1)]
            h = hash_str_u64(gs)
            pos = np.searchsorted(gh, h).clip(0, len(gh) - 1)
            dup = (gh[pos] == h) & (own[pos] != ids[i])
            if not dup.any():
                out_texts.append(" ".join(toks))
                continue
            # coverage mask: +1 at each dup start, -1 past its window
            diff = np.zeros(n + 1, np.int64)
            starts = np.nonzero(dup)[0]
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + k, -1)
            covered = np.cumsum(diff[:n]) > 0
            n_removed[i] = int(covered.sum())
            out_texts.append(
                " ".join(tok for tok, c in zip(toks, covered) if not c))
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "n_removed": pa.array(n_removed),
            "clean_text": pa.array(out_texts, pa.string()),
        })

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
