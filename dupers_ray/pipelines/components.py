"""Connected components over the verified near-dup edge list.

No native Ray Data primitive exists (SURVEY.md §7.4); two strategies:

- ``driver``: union-find with path compression on the driver. Edges are
  streamed in via iter_batches (never a full to_pandas of the corpus —
  only the EDGE list, which is orders of magnitude smaller than the input).
  Right choice while |edges| fits driver memory; guarded by ``max_driver_edges``.
- ``distributed``: iterative min-label propagation expressed as Dataset
  ops — per round: join(sym_edges, labels on src) → messages (dst, label);
  union with current labels; groupby(node % P).map_groups(min per node).
  Labels decrease monotonically to the component minimum; rounds ~ graph
  diameter (LSH star-pair buckets keep diameters small). Convergence =
  zero changed labels in a round (counted per-group, summed via a tiny
  aggregate — no extra join).

``components(..., strategy="auto")`` counts edges first and picks.
Output: (node: uint64, cluster_id: uint64 = min node id in component).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from dupers_ray.pipelines.joins import hash_join

logger = logging.getLogger(__name__)


# ------------------------------------------------------------------ driver UF

class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if ra > rb:  # min id wins as root → cluster_id = min node deterministic
            ra, rb = rb, ra
        self.parent[rb] = ra


def components_driver(edges: "ray.data.Dataset") -> pa.Table:
    """Union-find on the driver over a streamed edge list. Edges are
    vectorized-deduped per batch chunk before the Python union loop —
    candidate streams commonly carry heavy cross-band duplication."""
    uf = _UnionFind()
    seen: set[int] = set()
    for batch in edges.select_columns(["src", "dst"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        s = np.asarray(batch.column("src"), dtype=np.uint64)
        d = np.asarray(batch.column("dst"), dtype=np.uint64)
        with np.errstate(over="ignore"):
            key = s * np.uint64(0x100000001B3) + d
        _, first = np.unique(key, return_index=True)
        s, d = s[first], d[first]
        seen.update(s.tolist())
        seen.update(d.tolist())
        for si, di in zip(s.tolist(), d.tolist()):
            uf.union(si, di)
    nodes = sorted(seen)
    return pa.table(
        {
            "node": pa.array(np.array(nodes, dtype=np.uint64)),
            "cluster_id": pa.array(
                np.array([uf.find(n) for n in nodes], dtype=np.uint64)
            ),
        }
    )


# ------------------------------------------------------- distributed labelprop

def _init_labels(edges: "ray.data.Dataset", num_partitions: int) -> "ray.data.Dataset":
    def explode(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.uint64)
        d = np.asarray(t.column("dst"), dtype=np.uint64)
        n = np.concatenate([s, d])
        return pa.table({"node": pa.array(n)})

    nodes = edges.map_batches(explode, batch_format="pyarrow")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["node"].to_numpy(dtype=np.uint64))
        return pd.DataFrame({"node": pd.Series(u, dtype=np.uint64),
                             "label": pd.Series(u, dtype=np.uint64)})

    return (
        nodes.map_batches(_add_part, fn_kwargs={"col": "node", "p": num_partitions},
                          batch_format="pyarrow")
        .groupby("__part")
        .map_groups(dedup, batch_format="pandas")
    )


def _add_part(t: pa.Table, *, col: str, p: int) -> pa.Table:
    v = np.asarray(t.column(col), dtype=np.uint64)
    return t.append_column("__part", pa.array((v % np.uint64(p)).astype(np.int64)))


def components_distributed(
    edges: "ray.data.Dataset",
    *,
    num_partitions: int = 64,
    max_rounds: int = 12,
) -> "ray.data.Dataset":
    """Min-label propagation; each round is join + groupby (2 shuffles of
    edge/label-scale data). Early-stops when no label changes."""
    sym = edges.select_columns(["src", "dst"])

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("dst").cast(pa.uint64()),
                         "dst": t.column("src").cast(pa.uint64())})

    sym = sym.map_batches(
        lambda t: pa.table({"src": t.column("src").cast(pa.uint64()),
                            "dst": t.column("dst").cast(pa.uint64())}),
        batch_format="pyarrow",
    ).union(sym.map_batches(swap, batch_format="pyarrow")).materialize()

    labels = _init_labels(sym, num_partitions).materialize()

    edge_schema = pa.schema([("src", pa.uint64()), ("dst", pa.uint64())])
    label_schema = pa.schema([("node", pa.uint64()), ("label", pa.uint64())])
    for rnd in range(max_rounds):
        # messages: neighbor labels flowing along edges
        msgs = hash_join(sym, labels.select_columns(["node", "label"]),
                         on="src", right_on="node",
                         num_partitions=num_partitions,
                         left_schema=edge_schema, right_schema=label_schema)
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t.column("dst").cast(pa.uint64()),
                                "label": t.column("label").cast(pa.uint64()),
                                "is_self": pa.array(np.zeros(len(t), np.int8))}),
            batch_format="pyarrow",
        )
        selfs = labels.map_batches(
            lambda t: pa.table({"node": t.column("node").cast(pa.uint64()),
                                "label": t.column("label").cast(pa.uint64()),
                                "is_self": pa.array(np.ones(len(t), np.int8))}),
            batch_format="pyarrow",
        )

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            gb = g.groupby("node", sort=False)
            new = gb["label"].min()
            old = g[g["is_self"] == 1].set_index("node")["label"]
            old = old.reindex(new.index)
            changed = (new != old).astype(np.int64)
            return pd.DataFrame(
                {
                    "node": pd.Series(new.index.to_numpy(dtype=np.uint64), dtype=np.uint64),
                    "label": pd.Series(new.to_numpy(dtype=np.uint64), dtype=np.uint64),
                    "changed": changed.to_numpy(),
                }
            )

        new_labels = (
            msgs.union(selfs)
            .map_batches(_add_part, fn_kwargs={"col": "node", "p": num_partitions},
                         batch_format="pyarrow")
            .groupby("__part")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        n_changed = new_labels.aggregate(Sum("changed", alias_name="c"))["c"] or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        logger.info("components round %d: %d labels changed", rnd + 1, n_changed)
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.uint64()),
                            "cluster_id": t.column("label").cast(pa.uint64())}),
        batch_format="pyarrow",
    )


def components(
    edges: "ray.data.Dataset",
    *,
    strategy: str = "auto",
    max_driver_edges: int = 2_000_000,
    num_partitions: int = 64,
):
    """Dispatch. Returns a Dataset (distributed) or pyarrow Table (driver)."""
    if strategy == "auto":
        n = edges.count()
        strategy = "driver" if n <= max_driver_edges else "distributed"
        logger.info("components: %d edges → %s strategy", n, strategy)
    if strategy == "driver":
        return components_driver(edges)
    return components_distributed(edges, num_partitions=num_partitions)
