"""Oracle-vs-kernel lockstep tests (no Ray needed).

The driver compares each Ray query against its DuckDB oracle at sf0.01.
These tests pin the GENERATED oracle SQL to the live Python kernels on a
synthetic corpus, so a change to the hash stack / OPH / thresholds that
isn't mirrored in the oracle fails here instead of as a red driver cell.
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _docs_table() -> pa.Table:
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(vocab[int(j)] for j in rng.integers(0, 60, n)))
    # planted near-dups and exact dups
    texts[10] = texts[3] + " extra token"
    texts[11] = texts[3]
    texts[12] = texts[3].replace("w1", "w2", 1)
    return pa.table({"doc_id": pa.array(range(40), pa.int64()),
                     "text": pa.array(texts)})


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.register("documents", _docs_table())
    return c


def _nodes(ids):
    from dupers_ray.functions.hashing import node_ids

    return {i: int(node_ids([str(i)])[0]) for i in ids}


def test_flagship_cluster_oracle_matches_kernels(con):
    """The generated near_dup_clusters oracle reproduces, in SQL, what the
    engine kernels (MinHasher/OPH, star candidates, uint16-fold verify,
    exact union, min-label components) compute in Python."""
    import __ray_entry__ as m
    from dupers_ray.stages.minhash import MinHasher

    t = _docs_table()
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    mh = MinHasher(id_col="doc_id", text_col="text")
    sig, n_sh = mh.signatures(texts)
    keep = n_sh > 0
    kept = [i for i, k in zip(ids, keep) if k]
    nodes = _nodes(ids)
    S = {i: sig[j] for j, i in enumerate(kept)}

    from collections import defaultdict

    buckets = defaultdict(list)
    for i in kept:
        s = S[i]
        for b in range(32):
            buckets[(b, tuple(int(x) for x in s[4 * b : 4 * b + 4]))].append(
                nodes[i]
            )
    edges = set()
    node2sig = {nodes[i]: S[i] for i in kept}
    for members in buckets.values():
        if len(members) < 2:
            continue
        a = min(members)
        for mm in members:
            if mm == a:
                continue
            sa, sb = node2sig[a] & 0xFFFF, node2sig[mm] & 0xFFFF
            if (sa == sb).mean() >= 0.6:
                edges.add((a, mm))
    dg = defaultdict(list)
    for i, tx in zip(ids, texts):
        if tx:
            dg[hashlib.sha256(tx.encode()).digest()].append(nodes[i])
    for g in dg.values():
        if len(g) >= 2:
            a = min(g)
            edges.update((a, mm) for mm in g if mm != a)
    assert edges, "fixture must plant at least one edge"

    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for e in edges for n in e}
    expected = {i: comp.get(nodes[i], nodes[i]) for i in ids}

    rows = con.sql(m.oracle_sql()["near_dup_clusters"]).fetchall()
    got = {int(d): int(c) for d, c in rows}
    assert got == expected


def test_simhash_and_fingerprint_oracles_match_kernels(con):
    import __ray_entry__ as m
    from dupers_ray.stages.simhash import simhash_batch
    from dupers_ray.stages.textstats import fingerprint

    t = _docs_table()
    fp = fingerprint(t)
    expected_fp = {
        int(d): int(f)
        for d, f in zip(
            fp.column("doc_id").to_pylist(), fp.column("fingerprint").to_pylist()
        )
    }
    got_fp = {
        int(d): int(f)
        for d, f in con.sql(m.oracle_sql()["fingerprints"]).fetchall()
    }
    assert got_fp == expected_fp

    sh = simhash_batch(t, id_col="doc_id")
    sig = {
        int(n): int(s)
        for n, s in zip(
            sh.column("node").to_pylist(), sh.column("simhash").to_pylist()
        )
    }
    exp_pairs = set()
    ns = sorted(sig)
    for x in range(len(ns)):
        for y in range(x + 1, len(ns)):
            hd = bin(sig[ns[x]] ^ sig[ns[y]]).count("1")
            if hd <= 3:
                exp_pairs.add((ns[x], ns[y], hd))
    got_pairs = {
        (int(a), int(b), int(h))
        for a, b, h in con.sql(m.oracle_sql()["simhash_pairs"]).fetchall()
    }
    assert got_pairs == exp_pairs
