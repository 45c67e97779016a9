"""Display formatting — dupers' report columns (F8/F9 parity).

Reference: ``pkg/dupe/dupe.go:41`` pins the mtime layout ``"02 Jan 2006
15:04"`` (Go reference-time syntax → day, abbreviated month, year,
HH:MM) and ``dupe.go:493-496`` prints ``humanize.Bytes``-style sizes
next to each match. The engine carries RAW values (warc_ts, n_chars)
through the pipelines — formatting is a leaf ``map_batches`` over the
final (small) report, never applied mid-pipeline.

Both kernels are vectorized: strftime via pandas' DatetimeIndex (C
loop), sizes via numpy digitize over the decimal-unit table that
``go-humanize`` uses (1 kB = 1000 B).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Go layout "02 Jan 2006 15:04" → strftime
_MTIME_FMT = "%d %b %Y %H:%M"

_UNITS = ["B", "kB", "MB", "GB", "TB", "PB", "EB"]


def format_mtime(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Timestamp column → strings in the reference's report layout
    (dupe.go:41). Nulls stay null."""
    idx = pd.DatetimeIndex(col.to_pandas())
    out = idx.strftime(_MTIME_FMT)
    return pa.array(
        [None if pd.isna(v) else v for v in out.where(~idx.isna(), None)],
        pa.string(),
    )


def humanize_bytes(col: pa.ChunkedArray | pa.Array | np.ndarray) -> pa.Array:
    """Byte counts → go-humanize-style decimal strings ("12 kB", "3.4 MB"):
    1000-based units, one decimal below 10, none at or above (matching
    humanize.Bytes as printed at dupe.go:496). Nulls stay null."""
    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        vals = col.to_numpy(zero_copy_only=False).astype("float64")
    else:
        vals = np.asarray(col, dtype="float64")
    isnan = np.isnan(vals)
    safe = np.where(isnan, 0.0, np.abs(vals))
    # go-humanize humanateBytes exactly: s<10 prints raw; otherwise
    # e = floor(log_1000(s)); val = floor(s/1000^e*10 + 0.5)/10 (round to
    # ONE decimal first — the displayed unit can round up, e.g. 9950 ->
    # "10 kB"); then %.0f when val>=10 else %.1f
    small = safe < 10
    exp = np.zeros(len(safe), np.int64)
    big = ~small
    with np.errstate(divide="ignore"):
        exp[big] = np.minimum(
            np.floor(np.log(safe[big]) / np.log(1000.0)).astype(np.int64),
            len(_UNITS) - 1,
        )
    val = np.floor(safe / np.power(1000.0, exp) * 10.0 + 0.5) / 10.0
    out: list[str | None] = []
    for i in range(len(vals)):
        if isnan[i]:
            out.append(None)
        elif small[i]:
            out.append(f"{int(safe[i])} B")
        else:
            v, u = val[i], _UNITS[exp[i]]
            out.append(f"{v:.0f} {u}" if v >= 10 else f"{v:.1f} {u}")
    return pa.array(out, pa.string())


def format_report(
    batch: pa.Table,
    *,
    mtime_col: str | None = "warc_ts",
    size_col: str | None = "n_chars",
) -> pa.Table:
    """Append ``<col>_fmt`` display columns for the report printer —
    apply as the LAST map over the (small) report dataset."""
    out = batch
    if mtime_col and mtime_col in batch.column_names:
        out = out.append_column(f"{mtime_col}_fmt", format_mtime(batch.column(mtime_col)))
    if size_col and size_col in batch.column_names:
        out = out.append_column(f"{size_col}_fmt", humanize_bytes(batch.column(size_col)))
    return out
