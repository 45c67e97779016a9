"""Pointer-doubling chain resolution (stages/chains.py): planted
redirect chains resolve to their roots with exact hop counts in
ceil(log2 L) rounds; fixed point is stable under extra rounds."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.chains import resolve_pointers


def _chain_table(n: int = 40, period: int = 4) -> pa.Table:
    ids = np.arange(n, dtype=np.int64)
    ptr = np.where(ids % period == 0, ids, ids - 1)
    return pa.table({"id": pa.array(ids), "ptr": pa.array(ptr)})


def test_chains_resolve_to_roots():
    t = _chain_table(40, 4)  # chains of length <= 3 -> 2 rounds suffice
    got = (
        resolve_pointers(rd.from_arrow(t).repartition(4), rounds=2)
        .to_pandas().set_index("id").sort_index()
    )
    ids = np.arange(40)
    assert (got["root"].to_numpy() == ids - ids % 4).all()
    assert (got["hops"].to_numpy() == ids % 4).all()


def test_extra_rounds_are_fixed_point():
    t = _chain_table(24, 4)
    a = resolve_pointers(rd.from_arrow(t), rounds=2).to_pandas()
    b = resolve_pointers(rd.from_arrow(t), rounds=5).to_pandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_long_chain_needs_log_rounds():
    # one chain 0 <- 1 <- ... <- 9 (root 0): 2 rounds jump at most 4
    ids = np.arange(10, dtype=np.int64)
    t = pa.table({"id": pa.array(ids),
                  "ptr": pa.array(np.maximum(ids - 1, 0))})
    partial = resolve_pointers(rd.from_arrow(t), rounds=2).to_pandas()
    assert partial.set_index("id").loc[9, "root"] != 0  # not yet resolved
    full = resolve_pointers(rd.from_arrow(t), rounds=4).to_pandas()
    got = full.set_index("id").sort_index()
    assert (got["root"] == 0).all()
    assert (got["hops"].to_numpy() == ids).all()


def test_cycles_never_hang_and_are_detectable():
    """Redirect cycles are real crawl data: rounds is a hard bound, the
    output is deterministic, cycle hops double with extra rounds while
    resolved nodes stay fixed (the documented disambiguation rule)."""
    # 0 <-> 1 is a 2-cycle; 2 -> 3 -> 4(root) is a normal chain
    t = pa.table({
        "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ptr": pa.array([1, 0, 3, 4, 4], pa.int64()),
    })
    r2 = resolve_pointers(rd.from_arrow(t), rounds=2).to_pandas()
    r3 = resolve_pointers(rd.from_arrow(t), rounds=3).to_pandas()
    r2 = r2.set_index("id").sort_index()
    r3 = r3.set_index("id").sort_index()
    # resolved chain: fixed point across extra rounds
    for i, root, hops in [(2, 4, 2), (3, 4, 1), (4, 4, 0)]:
        assert (r2.loc[i, "root"], r2.loc[i, "hops"]) == (root, hops)
        assert (r3.loc[i, "root"], r3.loc[i, "hops"]) == (root, hops)
    # cycle members: hops == 2**rounds, doubling each extra round
    assert r2.loc[0, "hops"] == 4 and r2.loc[1, "hops"] == 4
    assert r3.loc[0, "hops"] == 8 and r3.loc[1, "hops"] == 8
