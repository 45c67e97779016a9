"""Typed field extraction from JSON-ish string columns.

Event streams carry a ``props`` payload column (semi-structured string).
At 100 TB you never parse full JSON per row for one field — you pull the
field with a vectorized RE2 kernel (``pyarrow.compute.extract_regex``)
and cast. Works for flat scalar fields, which is the overwhelmingly
common shape; nested payloads belong in real columns upstream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_json_str(
    batch: pa.Table,
    *,
    col: str = "props",
    key: str = "k",
    out_col: str | None = None,
) -> pa.Table:
    """Append string ``out_col`` = the value of ``"key": "<str>"`` (no
    escape handling — flat scalar fields, same contract as the int
    kernel); rows without the key → null."""
    out_col = out_col or key
    pat = rf'"{key}"\s*:\s*"(?P<v>[^"]*)"'
    m = pc.extract_regex(batch.column(col), pat)
    return batch.append_column(out_col, pc.struct_field(m, "v"))


def extract_jsonld(
    batch: pa.Table,
    *,
    html_col: str = "html",
    out_col: str = "jsonld",
) -> pa.Table:
    """Pull the first ``<script type="application/ld+json">`` payload out
    of raw html — the schema.org structured-data block web curation
    mines for titles/types/authors. ONE vectorized RE2 match over the
    html bytes; pages without a block → null."""
    pat = (
        r'(?is)<script\s+[^>]*type\s*=\s*["\x27]application/ld\+json'
        r'["\x27][^>]*>(?P<v>.*?)</script'
    )
    m = pc.extract_regex(batch.column(html_col), pat)
    v = pc.struct_field(m, "v")
    if pa.types.is_binary(v.type) or pa.types.is_large_binary(v.type):
        v = pc.cast(v, pa.string())
    return batch.append_column(out_col, v)


def extract_json_int(
    batch: pa.Table,
    *,
    col: str = "props",
    key: str = "k",
    out_col: str | None = None,
) -> pa.Table:
    """Append int64 ``out_col`` (default the key name) = the value of
    ``"key": <int>`` in the string column; rows without the key → null."""
    out_col = out_col or key
    pat = rf'"{key}"\s*:\s*(?P<v>-?\d+)'
    m = pc.extract_regex(batch.column(col), pat)
    v = pc.cast(pc.struct_field(m, "v"), pa.int64())
    return batch.append_column(out_col, v)
