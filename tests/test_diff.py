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


def test_exact_assign_and_agreement(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.diff import cluster_agreement, exact_assign

    # 12 docs: 4 content groups + 2 empties (must stay singletons)
    texts = ["aa", "aa", "aa", "bb", "bb", "cc", "dd", "dd", "dd", "dd",
             "", None]
    t = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = exact_assign(rd.from_arrow(t)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.cluster.tolist() == [0, 0, 0, 3, 3, 5, 6, 6, 6, 6, 10, 11]

    # agreement vs a hand-made second clustering, checked against the
    # brute-force pair enumeration it must never perform at scale
    b_assign = [0, 0, 3, 3, 3, 5, 6, 6, 6, 9, 10, 11]
    b = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "cluster": pa.array(b_assign, pa.int64()),
    }))
    a = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "cluster_id": pa.array(
            got.cluster.to_numpy().astype(np.uint64)),
    }))
    out = cluster_agreement(a, b).to_pydict()

    a_map = dict(zip(got.doc_id, got.cluster))
    b_map = dict(zip(range(12), b_assign))
    pa_ = pb_ = both = 0
    for i, j in itertools.combinations(range(12), 2):
        ea = a_map[i] == a_map[j]
        eb = b_map[i] == b_map[j]
        pa_ += ea
        pb_ += eb
        both += ea and eb
    assert out["pairs_a"] == [pa_]
    assert out["pairs_b"] == [pb_]
    assert out["pairs_both"] == [both]
    assert out["containment_a_ppm"] == [both * 1_000_000 // pa_]
