from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.config import SimHashConfig
from dupers_ray.stages.simhash import hamming, simhash_batch, simhash_pairs


def test_simhash_deterministic_and_similarity():
    base = "the quick brown fox jumps over the lazy dog again and again " * 10
    variant = base.replace("lazy", "sleepy")  # small change
    other = "completely different words about databases and shuffles " * 10
    t = pa.table({"url": ["a", "b", "c"], "text": [base, variant, other]})
    out1 = simhash_batch(t)
    out2 = simhash_batch(t)
    assert out1.column("simhash").to_pylist() == out2.column("simhash").to_pylist()
    s = np.array(out1.column("simhash").to_pylist(), dtype=np.uint64)
    d_near = hamming(s[:1], s[1:2])[0]
    d_far = hamming(s[:1], s[2:3])[0]
    assert d_near < d_far
    assert d_far > 10


def test_simhash_empty_doc_skipped():
    t = pa.table({"url": ["a", "b"], "text": ["", "some words here"]})
    out = simhash_batch(t)
    assert out.column("url").to_pylist() == ["b"]


def test_hamming():
    a = np.array([0b1011], np.uint64)
    b = np.array([0b0010], np.uint64)
    assert hamming(a, b)[0] == 2
    assert hamming(a, a)[0] == 0


def test_simhash_pairs_finds_near_identical():
    docs = []
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 20).split()
    for i in range(30):
        toks = list(base)
        toks[i % len(toks)] = f"unique{i}"  # tiny perturbation each
        docs.append({"url": f"d{i:02d}", "text": " ".join(toks)})
    for i in range(30):  # unrelated docs
        rng = np.random.default_rng(i)
        docs.append(
            {"url": f"r{i:02d}",
             "text": " ".join(f"w{int(x)}" for x in rng.integers(0, 5000, 150))}
        )
    ds = rd.from_items(docs).repartition(4)
    pairs = simhash_pairs(ds, SimHashConfig(hamming_threshold=3)).to_pandas()
    # the d* docs are near-identical bags → many close pairs; r* docs none
    assert len(pairs) > 0
    assert (pairs["hamming"] <= 3).all()
    from dupers_ray.functions.hashing import node_ids

    d_nodes = set(node_ids([f"d{i:02d}" for i in range(30)]).tolist())
    for s, d in zip(pairs["src"].astype(np.uint64), pairs["dst"].astype(np.uint64)):
        assert int(s) in d_nodes and int(d) in d_nodes


def test_hamming_bucket_cap_deterministic_prefix():
    """Buckets over max_bucket keep the min-node prefix (and log the
    drop — the no-silent-truncation contract): 10 identical sigs with
    max_bucket=4 must yield exactly C(4,2)=6 pairs over the 4 smallest
    nodes, not C(10,2)=45."""
    from dupers_ray.stages.simhash import hamming_pairs_from_sigs

    nodes = np.arange(1, 11, dtype=np.uint64)
    sigs = rd.from_arrow(pa.table({
        "node": pa.array(nodes),
        "simhash": pa.array(np.full(10, 0xDEAD, np.uint64)),
    }))
    pairs = hamming_pairs_from_sigs(
        sigs, hamming_threshold=0, max_bucket=4
    ).to_pandas()
    got = {(int(s), int(d)) for s, d in zip(pairs["src"], pairs["dst"])}
    want = {(i, j) for i in range(1, 5) for j in range(i + 1, 5)}
    assert got == want
