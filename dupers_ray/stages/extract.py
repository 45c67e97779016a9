"""Deterministic text extraction — the per-row parity invariant.

BASELINE.json:input_hint requires "byte-identical extracted text per url" —
the engine's analogue of the reference hashing raw file bytes
(pkg/dupe/parse/parse.go:217-231): whatever bytes go into the digest must be
a pure, deterministic function of the input.

This extractor is intentionally simple and fully specified (so it can be
pinned by golden fixtures): decode UTF-8 (errors="replace"), strip script
and style blocks, strip tags, decode the five core HTML entities, collapse
whitespace runs to single spaces, strip ends. No network, no parser
libraries, no locale dependence.
"""

from __future__ import annotations

import re

import pyarrow as pa

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so double-escapes resolve one level only (deterministic)
]


def extract_text_one(html: bytes | None) -> str:
    if not html:
        return ""
    raw = _TAG_RE.sub(b" ", _COMMENT_RE.sub(b" ", _SCRIPT_RE.sub(b" ", html)))
    s = raw.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def extract_text(batch: pa.Table, *, html_col: str = "html", out_col: str = "text") -> pa.Table:
    """map_batches stage: html binary -> extracted text column.

    Replaces ``out_col`` if present (pages fixtures carry a pre-extracted
    text column that must equal this function's output — tested)."""
    texts = [extract_text_one(b) for b in batch.column(html_col).to_pylist()]
    arr = pa.array(texts, pa.string())
    if out_col in batch.column_names:
        idx = batch.column_names.index(out_col)
        return batch.set_column(idx, out_col, arr)
    return batch.append_column(out_col, arr)


def drop_html(batch: pa.Table, *, html_col: str = "html") -> pa.Table:
    """Project away the wide binary column as soon as text is extracted —
    keeps downstream blocks small (SURVEY.md §7.4 'very wide rows')."""
    if html_col in batch.column_names:
        return batch.drop_columns([html_col])
    return batch
