"""C4-style line-level page cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2 — public heuristics).

Line rules (a line survives iff ALL hold):
  * ends in a terminal punctuation mark (``. ! ? "``),
  * has at least ``min_words`` words (single-space split semantics, the
    same count ``len(string_split(x, ' '))`` yields in the SQL oracle),
  * does not mention "javascript" (case-insensitive).

Page rules (a page survives iff ALL hold):
  * retains at least ``min_lines`` lines after line filtering,
  * contains no ``{`` (code/templating residue),
  * does not contain the phrase "lorem ipsum" (case-insensitive).

Everything is Arrow RE2 kernels + list-offset arithmetic — the flat line
array is masked with numpy and reassembled with ``ListArray.from_arrays``
+ ``binary_join``; no per-row Python. The reference has no text analytics
(it hashes bytes; pkg/dupe/parse hashing is the closest analogue) — this
is part of the engine-side LLM curation surface the task brief requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TERMINAL_RE = r'[.!?"]$'
_JS_RE = r"(?i)javascript"
_LOREM_RE = r"(?i)lorem ipsum"


def c4_clean_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> pa.Table:
    """One vectorized C4 cleaning pass over a batch. Returns the
    surviving pages as (id_col, cleaned_text, n_lines, n_kept)."""
    text = pc.fill_null(batch.column(text_col).combine_chunks(), "")
    if isinstance(text, pa.ChunkedArray):  # zero-chunk tables
        text = pa.concat_arrays(text.chunks) if text.num_chunks else pa.array([], pa.string())
    n = len(text)
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    flat = lines.flatten()

    ends_punct = pc.match_substring_regex(flat, _TERMINAL_RE)
    # len(string_split(x, ' ')) == count(' ') + 1 — exact oracle parity
    n_words = pc.add(pc.count_substring(flat, " "), 1)
    has_js = pc.match_substring_regex(flat, _JS_RE)
    keep_line = pc.and_(
        pc.and_(ends_punct, pc.greater_equal(n_words, min_words)),
        pc.invert(has_js),
    ).to_numpy(zero_copy_only=False)

    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    kept_counts = np.bincount(parent[keep_line], minlength=n).astype(np.int64)
    new_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=new_offsets[1:])
    kept_flat = flat.filter(pa.array(keep_line))
    kept_lists = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_flat)
    cleaned = pc.binary_join(kept_lists, "\n")

    keep_page = (
        (kept_counts >= min_lines)
        & np.invert(pc.match_substring(text, "{").to_numpy(zero_copy_only=False))
        & np.invert(
            pc.match_substring_regex(text, _LOREM_RE).to_numpy(zero_copy_only=False)
        )
    )
    out = pa.table(
        {
            id_col: batch.column(id_col),
            "cleaned_text": cleaned,
            "n_lines": pa.array(counts, pa.int64()),
            "n_kept": pa.array(kept_counts, pa.int64()),
        }
    )
    return out.filter(pa.array(keep_page))


def c4_clean(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
):
    """Streaming C4 cleaner: ONE stateless map_batches pass, no shuffle —
    at 100 TB this is embarrassingly parallel over blocks."""
    return ds.map_batches(
        lambda t: c4_clean_batch(
            t, id_col=id_col, text_col=text_col,
            min_words=min_words, min_lines=min_lines,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def blocklist_stats_batch(
    batch: pa.Table,
    *,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hit_pct: int = 5,
) -> pa.Table:
    """Word-boundary blocklist scoring (the C4 "bad words" stage shape):
    count ``\\b(term1|term2|...)\\b`` matches per doc with ONE RE2
    alternation, plus a keep flag via integer cross-multiplication
    (n_hits * 100 <= n_words * max_hit_pct) so the oracle is
    float-free. Terms must be regex-safe words (callers pass literals)."""
    text = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
    pat = r"\b(" + "|".join(terms) + r")\b"
    n_hits = pc.fill_null(pc.count_substring_regex(text, pat), 0).cast(pa.int64())
    n_words = pc.fill_null(pc.count_substring_regex(text, r"\S+"), 0).cast(pa.int64())
    keep = pc.less_equal(
        pc.multiply(n_hits, pa.scalar(100, pa.int64())),
        pc.multiply(n_words, pa.scalar(int(max_hit_pct), pa.int64())),
    )
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_hits": n_hits,
            "n_words": n_words,
            "keep": keep,
        }
    )


def blocklist_stats(
    ds,
    *,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hit_pct: int = 5,
):
    """Streaming blocklist scorer: one stateless pass, no shuffle."""
    return ds.map_batches(
        lambda t: blocklist_stats_batch(
            t, terms=terms, id_col=id_col, text_col=text_col,
            max_hit_pct=max_hit_pct,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
