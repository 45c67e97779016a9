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


def test_mirror_hosts_exact_jaccard():
    """Planted two mirror families (hosts 0-2 share family-A pages,
    3-5 family-B, plus per-host uniques): exact Jaccard, n_inter and
    set sizes match brute force; cross-family pairs never appear."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.overlap import mirror_hosts

    n = 300
    ids = np.arange(n)
    host = [f"h{int(i % 6)}" for i in ids]
    fam = ["A" if i % 6 < 3 else "B" for i in ids]
    text = [
        f"{f}p{int(i % 35)}" if i % 11 else f"{h}-unique-{int(i)}"
        for i, h, f in zip(ids, host, fam)
    ]
    t = pa.table({"host": host, "text": text})

    sets: dict[str, set] = {}
    for h, tx in zip(host, text):
        sets.setdefault(h, set()).add(tx)
    hs = sorted(sets)
    want = sorted(
        (a, b, len(sets[a] & sets[b]), len(sets[a]), len(sets[b]),
         round(len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 9))
        for i, a in enumerate(hs) for b in hs[i + 1:]
        if len(sets[a] & sets[b])
        and len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= 0.3
    )
    for parts in (3, 11):
        got = sorted(
            (r["host_a"], r["host_b"], r["n_inter"], r["n_a"], r["n_b"],
             round(r["jaccard"], 9))
            for r in mirror_hosts(
                rd.from_arrow(t).repartition(parts), min_jaccard=0.3
            ).take_all()
        )
        assert got == want
    assert len(want) == 6  # the two within-family triangles
    # hot-digest cap: shared page on EVERY host, cap below host count ->
    # capped pairs still exact for the uncapped digests, no crash
    t2 = pa.table({
        "host": [f"m{i}" for i in range(8)] * 2,
        "text": ["same-everywhere"] * 8 + [f"solo{i}" for i in range(8)],
    })
    out = mirror_hosts(
        rd.from_arrow(t2), min_jaccard=0.0, max_hosts_per_digest=4
    ).take_all()
    for r in out:
        assert r["n_inter"] == 1 and r["n_a"] == 2 and r["n_b"] == 2


def test_mirror_clusters_families():
    """The two planted mirror families collapse to two clusters labeled
    by each family's min node id; a lone host keeps its own node id."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.functions.hashing import node_ids
    from dupers_ray.pipelines.overlap import mirror_clusters

    n = 300
    ids = np.arange(n)
    host = [f"h{int(i % 6)}" for i in ids] + ["solo"]
    fam = ["A" if i % 6 < 3 else "B" for i in ids]
    text = [
        f"{f}p{int(i % 35)}" if i % 11 else f"{h}-unique-{int(i)}"
        for i, h, f in zip(ids, host, fam)
    ] + ["solo-only-page"]
    t = pa.table({"host": host, "text": text})
    got = {
        r["host"]: r["cluster_id"]
        for r in mirror_clusters(
            rd.from_arrow(t).repartition(4), min_jaccard=0.3
        ).take_all()
    }
    assert len(got) == 7
    nodes = {h: int(node_ids([h])[0]) for h in set(host)}
    fam_a = min(nodes[h] for h in ("h0", "h1", "h2"))
    fam_b = min(nodes[h] for h in ("h3", "h4", "h5"))
    for h in ("h0", "h1", "h2"):
        assert got[h] == fam_a
    for h in ("h3", "h4", "h5"):
        assert got[h] == fam_b
    assert got["solo"] == nodes["solo"]
