"""Repetition analysis: within-document repetition signals and
cross-document duplicate n-gram coverage.

Two standard curation measurements over web text (both engine-new; the
reference dedups whole files only):

- :func:`repetition_stats` — Gopher-style within-doc repetition: how
  concentrated are a doc's tokens/bigrams on their most frequent value?
  Emitted as INTEGER numerators/denominators (count columns) so the
  driver oracle hash-compares exactly; callers derive the fractions.
- :func:`dup_ngram_coverage` — the Lee-et-al-style cross-doc duplicate
  passage measure: per doc, how many of its distinct word-k-grams occur
  in at least one OTHER document. Shingle semantics are exactly
  ``stages/ngram.shingle_set`` (SQL-restatable md5-u64 hash family), so
  the coverage counts carry a full value oracle.

Scale shape of ``dup_ngram_coverage``: ONE shingling pass emits one
(gram_hash, doc_id, n_grams) row per DISTINCT gram per doc; the gram
groupby marks each row shared/unshared; a per-batch combiner collapses
the marked rows to per-doc partials before the second (doc-keyed)
groupby. Two shuffles of shingle-count-sized rows, no joins, no driver
materialization, shingles computed exactly once.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Sum

from dupers_ray.stages.textstats import _TOKEN_RE


def repetition_stats(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text",
) -> pa.Table:
    """Per-doc repetition numerators/denominators:

    - ``n_tokens`` / ``n_distinct_tokens`` / ``top_token_n``
    - ``n_bigrams`` / ``n_distinct_bigrams`` / ``top_bigram_n``

    Fractions (Gopher's top-2-gram fraction etc.) are
    ``top_bigram_n / n_bigrams`` — left to the caller to keep the
    columns integer-exact. Null/empty text → all zeros."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    out = {k: np.zeros(n, np.int64) for k in (
        "n_tokens", "n_distinct_tokens", "top_token_n",
        "n_bigrams", "n_distinct_bigrams", "top_bigram_n",
    )}
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = _TOKEN_RE.findall(t.lower())
        if not toks:
            continue
        tc = Counter(toks)
        out["n_tokens"][i] = len(toks)
        out["n_distinct_tokens"][i] = len(tc)
        out["top_token_n"][i] = tc.most_common(1)[0][1]
        if len(toks) >= 2:
            bc = Counter(zip(toks, toks[1:]))
            out["n_bigrams"][i] = len(toks) - 1
            out["n_distinct_bigrams"][i] = len(bc)
            out["top_bigram_n"][i] = bc.most_common(1)[0][1]
    cols = {id_col: batch.column(id_col)}
    cols.update({k: pa.array(v) for k, v in out.items()})
    return pa.table(cols)


def dup_ngram_coverage(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> "ray.data.Dataset":
    """Per doc with >=1 shingle: ``n_grams`` (distinct word-k-gram
    shingles) and ``n_dup_grams`` (those shared with >=1 other doc).
    Shingle-less docs (empty/null text) have no coverage to measure and
    are absent from the output."""
    from dupers_ray.pipelines.decontam import _shingle_hashes

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
        counts = np.fromiter((len(h) for h in hs), np.int64, len(hs))
        sh = np.concatenate(hs) if len(hs) else np.empty(0, np.uint64)
        return pa.table(
            {
                # int64 view: uint64 groupby keys above 2^63 fall into
                # Ray's pickled-object path (BASELINE.md notes)
                "gram": pa.array(sh.view(np.int64)),
                id_col: pa.array(np.repeat(ids, counts)),
                "n_grams": pa.array(np.repeat(counts, counts)),
            }
        )

    gram_rows = docs.map_batches(
        shingle_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def tag_shared(g: pa.Table) -> pa.Table:
        # rows are distinct (gram, doc) by construction; a group with >=2
        # rows means the gram crosses documents
        shared = np.full(g.num_rows, 1 if g.num_rows >= 2 else 0, np.int64)
        return pa.table(
            {
                id_col: g.column(id_col),
                "n_grams": g.column("n_grams"),
                "shared": pa.array(shared),
            }
        )

    tagged = gram_rows.groupby("gram").map_groups(
        tag_shared, batch_format="pyarrow"
    )

    def combine(t: pa.Table) -> pa.Table:
        g = (
            t.group_by([id_col])
            .aggregate([("n_grams", "max"), ("shared", "sum")])
        )
        return g.rename_columns([id_col, "n_grams", "shared"])

    partials = tagged.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby(id_col).aggregate(Max("n_grams"), Sum("shared"))
    return out.map_batches(
        lambda t: t.rename_columns([id_col, "n_grams", "n_dup_grams"]),
        batch_format="pyarrow",
    )


def content_novelty(
    docs: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> "ray.data.Dataset":
    """Per-doc content novelty in arrival order: ``n_novel`` of the
    doc's ``n_grams`` distinct word-k-gram shingles appear in NO
    earlier document (arrival = ascending ``id_col``; at crawl scale
    the key is (warc_ts, id) — same convention as first_publishers).
    The streaming-dedup question this answers: how much genuinely new
    content does each page (or, aggregated, each crawl batch) add?

    Same scale shape as :func:`dup_ngram_coverage` — one shingle
    combiner pass, a (gram, doc) 16 B-row shuffle where each gram group
    resolves its min-id owner vectorized-free (group rows only), then
    one per-doc sum; text bytes never shuffle, nothing broadcasts.
    Shingle-less docs are absent from the output (same contract)."""
    from dupers_ray.pipelines.decontam import _shingle_hashes

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        hs = _shingle_hashes(t.column(text_col).to_pylist(), k)
        counts = np.fromiter((len(h) for h in hs), np.int64, len(hs))
        sh = np.concatenate(hs) if len(hs) else np.empty(0, np.uint64)
        return pa.table(
            {
                "gram": pa.array(sh.view(np.int64)),
                id_col: pa.array(np.repeat(ids, counts)),
                "n_grams": pa.array(np.repeat(counts, counts)),
            }
        )

    gram_rows = docs.map_batches(
        shingle_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def tag_novel(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column(id_col), dtype=np.int64)
        novel = (ids == ids.min()).astype(np.int64)
        return pa.table(
            {
                id_col: g.column(id_col),
                "n_grams": g.column("n_grams"),
                "novel": pa.array(novel),
            }
        )

    tagged = gram_rows.groupby("gram").map_groups(
        tag_novel, batch_format="pyarrow"
    )

    def combine(t: pa.Table) -> pa.Table:
        g = (
            t.group_by([id_col])
            .aggregate([("n_grams", "max"), ("novel", "sum")])
        )
        return g.rename_columns([id_col, "n_grams", "novel"])

    partials = tagged.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby(id_col).aggregate(Max("n_grams"), Sum("novel"))
    return out.map_batches(
        lambda t: t.rename_columns([id_col, "n_grams", "n_novel"]),
        batch_format="pyarrow",
    )
