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


def test_near_source_overlap_matches_bruteforce(ray_session):
    from itertools import combinations

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.dupe import dupe_clusters
    from dupers_ray.pipelines.overlap import near_source_overlap

    rng = np.random.default_rng(11)
    W = "alpha beta gamma delta epsilon zeta eta theta".split()
    base = [" ".join(rng.choice(W, 80)) for _ in range(6)]
    texts, sources = [], []
    for i in range(120):
        if rng.random() < 0.5:
            toks = base[i % len(base)].split()
            toks[int(rng.integers(len(toks)))] = f"x{i % 3}"
            texts.append(" ".join(toks))
        else:
            texts.append(" ".join(rng.choice(W, 60)))
        sources.append(f"src_{i % 4}")
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "source": pa.array(sources, pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    out = near_source_overlap(
        rd.from_arrow(docs).repartition(4), cfg
    ).to_pandas()
    got = {(r.source_a, r.source_b): r.n_pairs for r in out.itertuples()}

    clus = dupe_clusters(
        rd.from_arrow(docs).select_columns(["doc_id", "text"]), cfg
    ).to_pandas()
    src_of = dict(zip(range(len(texts)), sources))
    from collections import Counter, defaultdict
    members = defaultdict(list)
    for r in clus.itertuples():
        members[r.cluster_id].append(src_of[r.doc_id])
    exp: Counter = Counter()
    for srcs in members.values():
        for a, b in combinations(sorted(srcs), 2):
            exp[(a, b)] += 1
    assert got == {k: v for k, v in exp.items() if v > 0}
    assert len(got) > 3  # planted near-dups span sources
