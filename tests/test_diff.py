from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.pipelines.diff import snapshot_diff


def _tbl(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)


def test_snapshot_diff_statuses():
    old = _tbl([(1, "a"), (2, "b"), (3, "c"), (4, ""), (5, None), (6, "f")])
    new = _tbl([(1, "a"), (2, "B"), (4, "now"), (7, "g")])
    out = snapshot_diff(old, new).to_pandas()
    got = dict(zip(out["doc_id"], out["status"]))
    # 1 unchanged; 2 changed; 3,6 removed; 4 empty-old -> added with
    # content; 5 null both sides dropped; 7 added
    assert got == {2: "changed", 3: "removed", 6: "removed",
                   4: "added", 7: "added"}


def test_snapshot_diff_identical_empty():
    old = _tbl([(i, f"t{i}") for i in range(50)])
    new = _tbl([(i, f"t{i}") for i in range(50)])
    assert snapshot_diff(old, new).count() == 0


def test_snapshot_diff_value_col():
    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([10, 20, 30], pa.int64()),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 4], pa.int64()),
        "n_chars": pa.array([10, 21, 40], pa.int64()),
    }))
    out = snapshot_diff(old, new, content_col=None, value_col="n_chars").to_pandas()
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == {2: "changed", 3: "removed", 4: "added"}
