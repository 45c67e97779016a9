"""Sharded LSH bucket index — actor-held state replacing the candidate
sort-shuffle.

This is the one place the engine drops to raw Ray actors (the brief's
"shared mutable index" exception): it is the scaled, SHARDED analogue of
dupers' in-RAM ``Checksums`` digest→first-path map
(pkg/dupe/parse/parse.go:31, loaded in SetCompares parse.go:101-117) —
except keyed by LSH band hash and holding each bucket's member set.

ONE pass over the signature table: each map task explodes its batch into
band rows locally (numpy), splits them by ``band_hash % n_shards`` and
ships the slices to shard actors through the object store. After the pass,
every shard vectorizes its rows into sorted buckets and emits star pairs
(min-node anchor → member) for buckets with >= 2 members; the pair tables
are returned as object refs and assembled with ``from_arrow_refs`` — the
driver never copies them.

Properties vs the sort-based groupby path:
- no AllToAll operator (the sort's per-block scheduling overhead was the
  single-node scaling ceiling) and no second pass over the band rows;
- hot buckets cost O(members) emissions inside one shard — no reducer
  blow-up, so no salting machinery;
- deterministic edges (min-node anchor) at any parallelism.

Shard memory: 16 B per band row held between ingest and build (the same
bytes a shuffle would stage), then 24 B per distinct bucket. Shard count
is the scale knob — on a real cluster the actors spread across nodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dupers_ray.config import MinHashConfig


@ray.remote
class BucketIndexShard:
    """Bucket key = (key, optional subkey) — subkey lets exact dedup bucket
    on two sha-256 words (2^-128 collision) with the same machinery."""

    def __init__(self):
        self._bh: list[np.ndarray] = []
        self._sub: list[np.ndarray] = []
        self._node: list[np.ndarray] = []

    def add(self, bh: np.ndarray, node: np.ndarray, sub: np.ndarray | None = None) -> int:
        self._bh.append(bh)
        self._node.append(node)
        self._sub.append(
            sub if sub is not None else np.zeros(len(bh), np.uint64)
        )
        return len(bh)

    def pairs_table(self, max_bucket_size: int = 0) -> pa.Table:
        """Sort accumulated rows into buckets, emit (src=min-node anchor,
        dst=member) star pairs for buckets with >=2 members. Optional
        per-bucket cap (0 = uncapped; star pairs are linear in members so
        the cap exists only as a memory guard for pathological hashes)."""
        if not self._bh:
            return pa.table(
                {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64())}
            )
        bh = np.concatenate(self._bh)
        sub = np.concatenate(self._sub)
        node = np.concatenate(self._node)
        self._bh = []
        self._sub = []
        self._node = []
        order = np.lexsort((node, sub, bh))
        bh, sub, node = bh[order], sub[order], node[order]
        new = np.r_[True, (bh[1:] != bh[:-1]) | (sub[1:] != sub[:-1])]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(bh)])
        anchors = node[starts][seg]
        keep = (node != anchors) & (sizes[seg] > 1)
        if max_bucket_size:
            rank = np.arange(len(bh)) - starts[seg]
            keep &= rank < max_bucket_size
        # dedupe identical (anchor, member) rows repeated across bands that
        # hashed into this shard: same pair ⇒ adjacent after a second sort
        src, dst = anchors[keep], node[keep]
        if len(src):
            o2 = np.lexsort((dst, src))
            src, dst = src[o2], dst[o2]
            uniq = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            src, dst = src[uniq], dst[uniq]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def candidate_pairs_index(
    sigs: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """(src, dst) candidate star pairs via the sharded bucket index, from
    the signature table directly (band explode fused into the ingest map)."""
    cfg = minhash or MinHashConfig()
    if n_shards is None:
        try:
            n_shards = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
        except Exception:  # noqa: BLE001
            n_shards = 8
    shards = [BucketIndexShard.remote() for _ in range(n_shards)]

    from dupers_ray.stages.minhash import explode_bands

    def ingest(t: pa.Table) -> pa.Table:
        b = explode_bands(t, bands=cfg.bands, rows=cfg.rows, id_col=id_col)
        bh = np.asarray(b.column("band_hash"), dtype=np.uint64)
        node = np.asarray(b.column("node"), dtype=np.uint64)
        sid = (bh % np.uint64(n_shards)).astype(np.int64)
        refs = []
        for s in range(n_shards):
            m = sid == s
            if m.any():
                refs.append(shards[s].add.remote(bh[m], node[m]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    sigs.map_batches(ingest, batch_format="pyarrow", zero_copy_batch=True).count()
    # shard-side pair emission; tables come back as object refs the driver
    # never copies (cross-band duplicates are deduped inside each shard)
    refs = [s.pairs_table.remote(0) for s in shards]
    ray.wait(refs, num_returns=len(refs))
    pairs = ray.data.from_arrow_refs(refs)
    for s in shards:
        ray.kill(s)
    return pairs


def exact_node_pairs_index(
    sigs: "ray.data.Dataset",
    *,
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """Exact-dup (src, dst) NODE pairs from the fused signature table's
    (digest_u64, digest_u64b) columns via the sharded index — the
    no-shuffle analogue of exact_dupe_pairs for cluster-edge generation
    (canonical choice is min NODE here, not min id string; components
    output is identical either way since cluster ids are min-node)."""
    if n_shards is None:
        try:
            n_shards = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
        except Exception:  # noqa: BLE001
            n_shards = 8
    shards = [BucketIndexShard.remote() for _ in range(n_shards)]

    def ingest(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("digest_u64"), dtype=np.uint64)
        sub = np.asarray(t.column("digest_u64b"), dtype=np.uint64)
        node = np.asarray(t.column("node"), dtype=np.uint64)
        sid = (k % np.uint64(n_shards)).astype(np.int64)
        refs = []
        for s in range(n_shards):
            m = sid == s
            if m.any():
                refs.append(shards[s].add.remote(k[m], node[m], sub[m]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    sigs.select_columns(["digest_u64", "digest_u64b", "node"]).map_batches(
        ingest, batch_format="pyarrow", zero_copy_batch=True
    ).count()
    refs = [s.pairs_table.remote(0) for s in shards]
    ray.wait(refs, num_returns=len(refs))
    pairs = ray.data.from_arrow_refs(refs)
    for s in shards:
        ray.kill(s)
    return pairs


def all_candidate_pairs_index(
    sigs: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    n_shards: int | None = None,
):
    """ONE pass over the fused signature table feeding two shard sets:
    LSH band buckets AND exact-digest buckets. Returns
    (lsh_pairs, exact_pairs) — the LSH side goes through Jaccard verify,
    the exact side is trusted (2^-128 digest collision)."""
    cfg = minhash or MinHashConfig()
    if n_shards is None:
        try:
            n_shards = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
        except Exception:  # noqa: BLE001
            n_shards = 8
    lsh_shards = [BucketIndexShard.remote() for _ in range(n_shards)]
    dg_shards = [BucketIndexShard.remote() for _ in range(n_shards)]

    from dupers_ray.stages.minhash import explode_bands

    def ingest(t: pa.Table) -> pa.Table:
        refs = []
        b = explode_bands(t, bands=cfg.bands, rows=cfg.rows, id_col=id_col)
        bh = np.asarray(b.column("band_hash"), dtype=np.uint64)
        bnode = np.asarray(b.column("node"), dtype=np.uint64)
        sid = (bh % np.uint64(n_shards)).astype(np.int64)
        for s in range(n_shards):
            m = sid == s
            if m.any():
                refs.append(lsh_shards[s].add.remote(bh[m], bnode[m]))
        k = np.asarray(t.column("digest_u64"), dtype=np.uint64)
        sub = np.asarray(t.column("digest_u64b"), dtype=np.uint64)
        node = np.asarray(t.column("node"), dtype=np.uint64)
        did = (k % np.uint64(n_shards)).astype(np.int64)
        for s in range(n_shards):
            m = did == s
            if m.any():
                refs.append(dg_shards[s].add.remote(k[m], node[m], sub[m]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    sigs.map_batches(ingest, batch_format="pyarrow", zero_copy_batch=True).count()
    lsh_refs = [s.pairs_table.remote(0) for s in lsh_shards]
    dg_refs = [s.pairs_table.remote(0) for s in dg_shards]
    ray.wait(lsh_refs + dg_refs, num_returns=2 * n_shards)
    lsh_pairs = ray.data.from_arrow_refs(lsh_refs)
    exact_pairs = ray.data.from_arrow_refs(dg_refs)
    for s in lsh_shards + dg_shards:
        ray.kill(s)
    return lsh_pairs, exact_pairs
