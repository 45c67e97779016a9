"""Substring search — dupers' ``search`` command (second pillar).

Reference: pkg/database/database.go:373-447 — four compare modes
(case-sensitive/insensitive × full-path/basename), each a full linear scan
of every key with ``bytes.Contains``; results grouped by bucket and sorted
(pkg/dupe/parse/parse.go:172-214, 255-264).

Engine: a vectorized filter over the Dataset (``pyarrow.compute``
match_substring kernels — the scan is embarrassingly parallel across
blocks, no shuffle), with an optional sort for the stable report. For
repeated many-term containment queries over huge sorted partitions, see
stages/suffix.py (the suffix-array scale path, north rule).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _basename(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Substring after the last '/' — the Base of a path/url
    (reference CompareBase, database.go:379-383).

    pc.list_element rejects negative indices, so take the last segment via
    reverse → split → first → reverse (all vectorized kernels)."""
    rev = pc.utf8_reverse(col)
    first = pc.list_element(pc.split_pattern(rev, "/"), 0)
    return pc.utf8_reverse(first)


def match_mask(
    col,
    term: str,
    *,
    exact: bool = True,
    basename: bool = False,
):
    """Boolean mask replicating the reference's four compare modes:
    exact=True → case-sensitive (F1/F3); exact=False → case-insensitive
    (F2/F4); basename=True → match only after the last '/' (F3/F4)."""
    target = _basename(col) if basename else col
    return pc.match_substring(target, term, ignore_case=not exact)


def search(
    ds: "ray.data.Dataset",
    term: str,
    *,
    column: str = "url",
    exact: bool = True,
    basename: bool = False,
    keep_cols: list[str] | None = None,
    sort: bool = True,
) -> "ray.data.Dataset":
    """Filter rows whose ``column`` contains ``term``; stable sort for the
    report (reference sorts bucket names then paths — parse.go:255-264)."""
    keep = keep_cols or list(ds.schema().names)

    def f(batch: pa.Table) -> pa.Table:
        mask = match_mask(batch.column(column), term, exact=exact, basename=basename)
        return batch.filter(mask).select(keep)

    out = ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        out = out.sort(keep[0])
    return out
