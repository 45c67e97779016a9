from __future__ import annotations

import hashlib
from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.pipelines.overlap import source_overlap


def _docs(n=300, seed=9, n_sources=5, n_contents=40):
    rng = np.random.default_rng(seed)
    texts = [f"content number {i} padded" for i in rng.integers(0, n_contents, n)]
    srcs = [f"s{int(i):02d}" for i in rng.integers(0, n_sources, n)]
    # a few empties/nulls must be excluded
    texts[0], texts[1] = "", None
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(srcs, pa.string()),
    }), texts, srcs


def _brute(texts, srcs):
    rows = [(t, s) for t, s in zip(texts, srcs) if t]
    groups: dict[str, list[str]] = {}
    for t, s in rows:
        groups.setdefault(hashlib.sha256(t.encode()).hexdigest(), []).append(s)
    pairs: Counter = Counter()
    for members in groups.values():
        for a, b in combinations(sorted(members), 2):
            pairs[(a, b)] += 1
    return pairs


def test_source_overlap_matches_bruteforce():
    tbl, texts, srcs = _docs()
    out = (
        source_overlap(rd.from_arrow(tbl).repartition(6))
        .to_pandas().sort_values(["source_a", "source_b"]).reset_index(drop=True)
    )
    exp = _brute(texts, srcs)
    got = {(r.source_a, r.source_b): r.n_pairs for r in out.itertuples()}
    assert got == {k: v for k, v in exp.items() if v > 0}
    # matrix is upper-triangular by construction
    assert (out["source_a"] <= out["source_b"]).all()


def test_source_overlap_no_dups_is_empty():
    tbl = pa.table({
        "text": pa.array([f"unique {i}" for i in range(50)], pa.string()),
        "source": pa.array(["a"] * 25 + ["b"] * 25, pa.string()),
    })
    assert source_overlap(rd.from_arrow(tbl)).count() == 0
