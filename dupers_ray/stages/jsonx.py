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
