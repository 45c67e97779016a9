"""Text canonicalization for fuzzy-exact dedup.

Web corpora are full of pages identical up to case / punctuation /
whitespace; exact content hashing (``parse.Read``'s whole-file SHA-256,
reference ``pkg/dupe/parse/parse.go:217-231``) misses all of them. The
standard curation move is to hash a NORMALIZED view of the text instead
(C4/CCNet-style): lowercase, strip non-alphanumerics, collapse runs of
whitespace. This stage produces that view with pure Arrow kernels (RE2
via ``pyarrow.compute`` — no Python per row), and the existing exact
pipeline runs unchanged on the normalized column.

All three rewrites are SQL-restatable (DuckDB is RE2-based too), so the
driver value-oracles the normalized digests end to end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_text(
    batch: pa.Table, *, text_col: str = "text", out_col: str = "text_norm",
) -> pa.Table:
    """lowercase → drop ``[^a-z0-9\\s]`` → collapse ``\\s+`` to one space
    → trim. Null stays null; a punctuation-only text becomes ''."""
    s = pc.utf8_lower(batch.column(text_col))
    s = pc.replace_substring_regex(s, pattern=r"[^a-z0-9\s]+", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col), out_col, s)
    return batch.append_column(out_col, s)
