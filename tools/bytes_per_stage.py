"""Bytes-moved and wall-time per flagship stage + a DRAM-bandwidth probe.

Round-2 VERDICT item 7 asked for the scaling evidence to become
actionable: "publish bytes-moved per stage next to wall time ... or a
quantified bandwidth budget proving the floor". This tool runs the
flagship dupe pipeline stage-by-stage (materialize barriers between
stages so wall time attributes cleanly), records rows / bytes / wall
per stage, and measures the box's ACHIEVABLE aggregate DRAM bandwidth
with a numpy triad kernel at increasing process counts — the ceiling
that explains the 8→32 single-box efficiency plateau documented in
BASELINE.md.

Usage:
    RAY_GRAFT_CPUS=32 python tools/bytes_per_stage.py
    python tools/bytes_per_stage.py --dram-only
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dram_probe(proc_counts=(1, 4, 8, 16, 32), mb: int = 256, reps: int = 3) -> dict:
    """Aggregate triad (a = b + s*c) bandwidth in GB/s at each process
    count. Each worker streams 3 arrays of ``mb`` MB — far beyond L3 —
    so the measured rate is DRAM, not cache."""

    def worker(q, barrier, mb, reps):
        n = mb * 1024 * 1024 // 8
        b = np.random.default_rng(0).random(n)
        c = np.random.default_rng(1).random(n)
        a = np.empty_like(b)
        barrier.wait()
        t0 = time.perf_counter()
        for _ in range(reps):
            np.multiply(c, 1.1, out=a)  # read c, write a
            a += b                      # read a, read b, write a
        dt = time.perf_counter() - t0
        q.put(5 * 8 * n * reps / dt)

    out = {}
    for p in proc_counts:
        q = mp.Queue()
        barrier = mp.Barrier(p)
        procs = [
            mp.Process(target=worker, args=(q, barrier, mb, reps))
            for _ in range(p)
        ]
        for pr in procs:
            pr.start()
        rates = [q.get() for _ in procs]
        for pr in procs:
            pr.join()
        out[p] = round(sum(rates) / 1e9, 2)
    return out


def stage_bench(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.components import components
    from dupers_ray.pipelines.dupe import assign_clusters, _url_to_node
    from dupers_ray.pipelines.near_dedup import minhash_signatures, verify_pairs
    from dupers_ray.stages.bucket_index import all_candidate_pairs_index

    from bench import ensure_pages_corpus

    pages = ensure_pages_corpus()  # the identical corpus bench.py times
    from dupers_ray.config import MinHashConfig

    # GRAFT_SIG_STORE=u2 measures the half-width signature store
    # (BASELINE.md round-4 bytes-cut experiment)
    cfg = DedupConfig(minhash=MinHashConfig(
        sig_store=os.environ.get("GRAFT_SIG_STORE", "u4")))

    input_bytes = sum(
        os.path.getsize(os.path.join(pages, f))
        for f in os.listdir(pages)
        if f.endswith(".parquet")
    )
    rd.read_parquet(pages).count()  # warm page cache

    stages = []

    def record(name, wall, rows, nbytes, note=""):
        stages.append({
            "stage": name, "wall_s": round(wall, 2), "rows": int(rows),
            "mb": round(nbytes / 1e6, 1), "note": note,
        })

    ds = rd.read_parquet(pages, columns=["url", "text"])

    t0 = time.perf_counter()
    sigs = minhash_signatures(
        ds, shingle=cfg.shingle, minhash=cfg.minhash, id_col="url",
        text_col="text", with_digests=True,
    ).materialize()
    record("read+extract+sig+digest", time.perf_counter() - t0,
           sigs.count(), sigs.size_bytes(),
           f"in {input_bytes/1e6:.0f} MB parquet")

    t0 = time.perf_counter()
    lsh_pairs, exact_pairs = all_candidate_pairs_index(
        sigs, minhash=cfg.minhash, id_col="url"
    )
    lsh_pairs = lsh_pairs.materialize()
    exact_pairs = exact_pairs.materialize()
    n_bands = cfg.minhash.bands
    band_bytes = sigs.count() * n_bands * 16
    record("band->sharded index->candidates", time.perf_counter() - t0,
           lsh_pairs.count() + exact_pairs.count(),
           lsh_pairs.size_bytes() + exact_pairs.size_bytes(),
           f"{band_bytes/1e6:.0f} MB band rows shipped (16 B x {n_bands}/doc)")

    t0 = time.perf_counter()
    near = verify_pairs(lsh_pairs, sigs, minhash=cfg.minhash).materialize()
    record("jaccard verify", time.perf_counter() - t0,
           near.count(), near.size_bytes(),
           "sig gathers bounded by candidate count")

    t0 = time.perf_counter()
    edges = near.select_columns(["src", "dst"]).union(exact_pairs).materialize()
    assign = components(edges)
    import pyarrow as pa

    assign_rows = assign.num_rows if isinstance(assign, pa.Table) else assign.count()
    record("components", time.perf_counter() - t0, assign_rows,
           edges.size_bytes(), "edge list + union-find")

    t0 = time.perf_counter()
    mapping = rd.read_parquet(pages, columns=["url"]).map_batches(
        _url_to_node, fn_kwargs={"id_col": "url"},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = assign_clusters(mapping, assign, id_col="url").materialize()
    record("assignment", time.perf_counter() - t0, out.count(),
           out.size_bytes(), "broadcast-or-join by size")

    total = sum(s["wall_s"] for s in stages)
    ray.shutdown()
    return {"ncpu": ncpu, "input_mb": round(input_bytes / 1e6, 1),
            "total_wall_s": round(total, 2), "stages": stages}


def main() -> None:
    if "--dram-only" in sys.argv:
        print(json.dumps({"dram_gbps": dram_probe()}))
        return
    # the tool always benches the flagship's own cached pages corpus
    # (ensure_pages_corpus); it takes no sf_dir operand
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    result = stage_bench(ncpu)
    if "--with-dram" in sys.argv:
        result["dram_gbps"] = dram_probe()
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
