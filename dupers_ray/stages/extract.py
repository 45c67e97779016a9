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


_META_CHARSET_RE = re.compile(
    rb"(?is)<meta\s+[^>]*charset\s*=\s*[\"']?\s*([a-z0-9_\-]+)"
)
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "ascii": "utf-8",
    "us-ascii": "utf-8",
    "latin-1": "latin-1", "latin1": "latin-1", "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
}


def sniff_charset(html: bytes | None) -> str:
    """Charset detection the way crawl ingest does it (WHATWG encoding
    sniff, the deterministic subset): BOM first (utf-8 / utf-16 LE/BE),
    else ``<meta charset=…>`` / http-equiv charset in the first 1024
    bytes (ASCII-compatible prelude), else utf-8. Returns the canonical
    python codec name."""
    if not html:
        return "utf-8"
    if html[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if html[:2] == b"\xff\xfe":
        return "utf-16-le"
    if html[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _META_CHARSET_RE.search(html[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        return _CHARSET_ALIASES.get(label, "utf-8")
    return "utf-8"


def transcode_html(
    batch: pa.Table,
    *,
    html_col: str = "html",
    charset_col: str = "charset",
) -> pa.Table:
    """Normalize every page to utf-8 bytes: sniff (BOM / meta charset),
    decode with errors="replace", re-encode utf-8; the detected label
    lands in ``charset_col``. Downstream digest/extract then see ONE
    encoding — the transcode-at-ingest step of every real crawl
    pipeline (CC WET generation does the same). utf-16 BOMs strip; a
    wrong or missing label degrades to replacement chars, never an
    exception."""
    out: list[bytes] = []
    labels: list[str] = []
    for b in batch.column(html_col).to_pylist():
        cs = sniff_charset(b)
        labels.append(cs)
        if b is None:
            out.append(b"")
            continue
        if cs in ("utf-8", "utf-8-sig"):
            s = b.decode("utf-8-sig" if cs == "utf-8-sig" else "utf-8",
                         "replace")
        elif cs in ("utf-16-le", "utf-16-be"):
            # the plain utf-16 codec consumes the BOM (utf-16-le/-be
            # would keep it as a leading U+FEFF)
            s = b.decode("utf-16", "replace")
        else:
            s = b.decode(cs, "replace")
        out.append(s.encode("utf-8"))
    idx = batch.column_names.index(html_col)
    batch = batch.set_column(idx, html_col, pa.array(out, pa.binary()))
    return batch.append_column(charset_col, pa.array(labels, pa.string()))


_BLOCK_RE = re.compile(
    rb"(?i)</?(?:p|div|nav|header|footer|aside|article|section|li|ul|ol|"
    rb"table|tr|td|h[1-6]|br)\b[^>]*>"
)
_ANCHOR_RE = re.compile(rb"(?is)<a\b[^>]*>(.*?)</a\s*>")


def _visible_len(segment: bytes) -> int:
    """Length of the whitespace-collapsed visible text of an html
    segment — the same strip/decode/collapse chain as
    :func:`extract_text_one`, so density is measured on exactly the
    text a reader sees."""
    raw = _TAG_RE.sub(b" ", segment)
    s = raw.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return len(_WS_RE.sub(" ", s).strip())


def main_content_one(
    html: bytes | None, *, max_link_density: float = 0.5
) -> str:
    """Boilerplate-vs-content block classification by LINK DENSITY
    (Kohlschütter et al. 2010 "Boilerplate Detection Using Shallow Text
    Features" — the boilerpipe/readability heuristic, reimplemented from
    the paper's public description): split the page into block-level
    segments, measure each block's anchor-text share, and keep blocks
    whose linked characters are <= ``max_link_density`` of the visible
    characters. Nav bars, footers and link farms are (nearly) all
    anchor text and drop out; running prose keeps. Deterministic,
    stdlib-only, same entity/whitespace canon as the exact extractor so
    planted pages restate exactly in SQL."""
    if not html:
        return ""
    cleaned = _COMMENT_RE.sub(b" ", _SCRIPT_RE.sub(b" ", html))
    kept: list[str] = []
    for seg in _BLOCK_RE.split(cleaned):
        if not seg.strip():
            continue
        total = _visible_len(seg)
        if not total:
            continue
        linked = sum(_visible_len(m) for m in _ANCHOR_RE.findall(seg))
        if linked <= max_link_density * total:
            raw = _TAG_RE.sub(b" ", seg)
            s = raw.decode("utf-8", errors="replace")
            for ent, ch in _ENTITIES:
                s = s.replace(ent, ch)
            kept.append(_WS_RE.sub(" ", s).strip())
    return " ".join(k for k in kept if k)


def extract_main_content(
    batch: pa.Table,
    *,
    html_col: str = "html",
    out_col: str = "main_text",
    max_link_density: float = 0.5,
) -> pa.Table:
    """map_batches stage: html binary -> link-density main content."""
    texts = [
        main_content_one(b, max_link_density=max_link_density)
        for b in batch.column(html_col).to_pylist()
    ]
    return batch.append_column(out_col, pa.array(texts, pa.string()))


def drop_html(batch: pa.Table, *, html_col: str = "html") -> pa.Table:
    """Project away the wide binary column as soon as text is extracted —
    keeps downstream blocks small (SURVEY.md §7.4 'very wide rows')."""
    if html_col in batch.column_names:
        return batch.drop_columns([html_col])
    return batch
