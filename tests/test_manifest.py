"""Resumability: partition manifests, atomic outputs, phase checkpoints,
and the checkpointed flagship (kill → resume without recompute)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from dupers_ray.config import DedupConfig
from dupers_ray.pipelines.dupe import dupe_clusters, dupe_clusters_checkpointed
from dupers_ray.state.manifest import (
    read_partitioned,
    run_partitioned,
    run_phased,
)


@pytest.fixture()
def shards(tmp_path):
    files = []
    for i in range(4):
        t = pa.table(
            {
                "url": [f"u{i}_{j}" for j in range(50)],
                "text": [f"doc {i} {j} content words here" for j in range(50)],
            }
        )
        p = str(tmp_path / f"shard{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def _count_pipeline(marker_dir):
    os.makedirs(marker_dir, exist_ok=True)

    def fn(ds):
        # leave a marker per invocation so tests can count executions
        n = len(os.listdir(marker_dir))
        open(os.path.join(marker_dir, f"run{n}"), "w").close()
        return ds.map_batches(
            lambda t: t.append_column("n", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow",
        )

    return fn


def test_run_partitioned_and_resume(shards, tmp_path):
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    r1 = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert len(r1["completed"]) == 4 and not r1["skipped"]
    assert r1["rows"] == 200
    assert len(os.listdir(markers)) == 4
    # manifests written
    mans = sorted(glob.glob(os.path.join(out, "_manifests", "*.json")))
    assert len(mans) == 4
    m = json.load(open(mans[0]))
    assert m["status"] == "complete" and m["rows"] == 50 and m["stage"] == "s1"

    # resume: nothing re-executes
    r2 = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert len(r2["skipped"]) == 4 and not r2["completed"]
    assert len(os.listdir(markers)) == 4  # no new executions
    assert read_partitioned(out).count() == 200


def test_run_partitioned_input_change_invalidates(shards, tmp_path):
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    # modify shard 2 → only that partition re-runs
    t = pq.read_table(shards[2])
    pq.write_table(t.slice(0, 40), shards[2])
    os.utime(shards[2], (1e9, 1e9))
    r = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert len(r["completed"]) == 1 and len(r["skipped"]) == 3
    assert r["rows"] == 190


def test_tmp_sibling_does_not_invalidate_completed_partition(shards, tmp_path):
    """A torn 'partition=NNNNN.tmp' leftover must be swept WITHOUT deleting
    the completed sibling partition's manifest — two resumable runs sharing
    a workdir would otherwise silently drop each other's finished work."""
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    # simulate a torn write next to a valid completed partition
    os.makedirs(os.path.join(out, "partition=00001.tmp"))
    open(os.path.join(out, "partition=00001.tmp", "part.parquet"), "w").close()
    r = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert "partition=00001.tmp" in r["pruned"]
    assert not os.path.exists(os.path.join(out, "partition=00001.tmp"))
    # the completed partition survived: nothing recomputed, all rows present
    assert len(r["skipped"]) == 4 and not r["completed"]
    assert read_partitioned(out).count() == 200


def test_run_partitioned_config_change_invalidates(shards, tmp_path):
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    run_partitioned(shards, out, _count_pipeline(markers), stage="s1",
                    config_fingerprint="a")
    r = run_partitioned(shards, out, _count_pipeline(markers), stage="s1",
                        config_fingerprint="b")
    assert len(r["completed"]) == 4


def test_killed_run_resumes(shards, tmp_path):
    """Fail partway through → rerun completes only the missing partitions."""
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    calls = {"n": 0}
    base = _count_pipeline(markers)

    def failing(ds):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated worker death")
        return base(ds)

    with pytest.raises(RuntimeError):
        run_partitioned(shards, out, failing, stage="s1")
    # two partitions completed before the crash
    assert len(glob.glob(os.path.join(out, "_manifests", "*.json"))) == 2

    r = run_partitioned(shards, out, base, stage="s1")
    assert len(r["skipped"]) == 2 and len(r["completed"]) == 2
    assert read_partitioned(out).count() == 200


def test_run_phased_resume(tmp_path):
    work = str(tmp_path / "w")
    runs = []

    def p1(_prev):
        runs.append("p1")
        return rd.from_items([{"x": i} for i in range(10)])

    def p2(prev):
        runs.append("p2")
        return rd.read_parquet(prev["one"]).map_batches(
            lambda t: t.append_column("y", pa.array([2] * len(t), pa.int64())),
            batch_format="pyarrow",
        )

    out = run_phased([("one", p1), ("two", p2)], work)
    assert runs == ["p1", "p2"]
    assert rd.read_parquet(out["two"]).count() == 10
    out2 = run_phased([("one", p1), ("two", p2)], work)
    assert runs == ["p1", "p2"]  # both skipped
    assert rd.read_parquet(out2["two"]).count() == 10


def test_checkpointed_flagship_matches_direct(tmp_path, pages_small):
    # write the synthetic corpus as shards
    files = []
    n = pages_small.pages.num_rows
    for i in range(3):
        chunk = pages_small.pages.slice(i * (n // 3 + 1), n // 3 + 1)
        p = str(tmp_path / f"pages{i}.parquet")
        pq.write_table(chunk, p)
        files.append(p)

    cfg = DedupConfig()
    work = str(tmp_path / "work")
    ck = dupe_clusters_checkpointed(files, work, cfg).to_pandas()
    direct = dupe_clusters(rd.read_parquet(files), cfg).to_pandas()
    m = ck.merge(direct, on="url", suffixes=("_ck", "_d"))
    assert len(m) == len(direct) == len(ck)
    assert (m["cluster_id_ck"] == m["cluster_id_d"]).all()

    # resume is a no-op returning identical clusters
    ck2 = dupe_clusters_checkpointed(files, work, cfg).to_pandas()
    m2 = ck.merge(ck2, on="url", suffixes=("_1", "_2"))
    assert (m2["cluster_id_1"] == m2["cluster_id_2"]).all()


def test_stale_partitions_pruned_and_phase_invalidated(shards, tmp_path):
    """Round-1 ADVICE: fewer input files on rerun must prune leftover
    partitions (not leak them into read_partitioned), and a changed input
    must invalidate run_phased outputs via the upstream fingerprint."""
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    r_all = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert len(r_all["completed"]) == 4

    # rerun with only 2 of the 4 inputs: partitions 2..3 pruned
    r_two = run_partitioned(shards[:2], out, _count_pipeline(markers), stage="s1")
    assert len(r_two["skipped"]) == 2 and len(r_two["pruned"]) == 2
    assert read_partitioned(out).count() == 100
    assert r_two["fingerprint"] != r_all["fingerprint"]

    # wide phase pinned to the partition fingerprint re-runs when it changes
    runs = []

    def phase(_prev):
        runs.append(1)
        return rd.from_items([{"x": 1}])

    work = str(tmp_path / "w")
    run_phased([("p", phase)], work, upstream_fingerprint=r_all["fingerprint"])
    run_phased([("p", phase)], work, upstream_fingerprint=r_all["fingerprint"])
    assert len(runs) == 1  # same upstream → skipped
    run_phased([("p", phase)], work, upstream_fingerprint=r_two["fingerprint"])
    assert len(runs) == 2  # changed upstream → re-ran


def test_snapshot_restore_roundtrip(shards, tmp_path):
    """`backup` parity (pkg/database/io.go:40-55): snapshot, clobber the
    live index, restore, resume skips everything."""
    from dupers_ray.state.manifest import (
        compact_index,
        list_snapshots,
        restore_snapshot,
        snapshot_index,
    )

    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    snap = snapshot_index(out, "pre")
    assert snap["files"] > 0 and list_snapshots(out) == ["pre"]

    # clobber live state (keep snapshots), then restore
    import shutil

    for d in os.listdir(out):
        if d != "_snapshots":
            shutil.rmtree(os.path.join(out, d))
    restore_snapshot(out, "pre")
    assert read_partitioned(out).count() == 200
    r = run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    assert len(r["skipped"]) == 4 and not r["completed"]


def test_compact_removes_dead_state(shards, tmp_path):
    """`compact` parity (database.go:307-371): tmp dirs and orphan
    manifests are dropped, live partitions survive."""
    from dupers_ray.state.manifest import compact_index

    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    run_partitioned(shards, out, _count_pipeline(markers), stage="s1")
    os.makedirs(os.path.join(out, "partition=00009.tmp"))
    # orphan manifest: dir removed behind our back
    import shutil

    shutil.rmtree(os.path.join(out, "partition=00003"))
    stats = compact_index(out)
    assert any("00009.tmp" in d for d in stats["removed_dirs"])
    assert "partition=00003.json" in stats["removed_manifests"]
    assert read_partitioned(out).count() == 150


def test_checkpointed_packing_matches_direct(tmp_path, pages_small):
    """packed_windows_checkpointed == packed_windows on the same shards,
    and a resume (same workdir, same inputs) recomputes nothing."""
    import numpy as np

    from dupers_ray.stages.budget import (
        packed_windows, packed_windows_checkpointed,
    )

    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    files = []
    n = tbl.num_rows
    for i in range(3):
        p = str(tmp_path / f"docs{i}.parquet")
        pq.write_table(tbl.slice(i * (n // 3 + 1), n // 3 + 1), p)
        files.append(p)

    work = str(tmp_path / "packwork")
    ck = {
        r["seq_id"]: (r["n_toks"], r["checksum"])
        for r in packed_windows_checkpointed(
            files, work, seq_len=96
        ).take_all()
    }
    direct = {
        r["seq_id"]: (r["n_toks"], r["checksum"])
        for r in packed_windows(
            rd.read_parquet(files), seq_len=96
        ).take_all()
    }
    assert ck == direct and len(ck) > 1

    # resume: stats partitions all skipped, phases skipped, same output
    from dupers_ray.state.manifest import run_partitioned
    from dupers_ray.stages.budget import token_stats

    r2 = run_partitioned(
        files, f"{work}/stats",
        lambda ds: token_stats(ds),
        stage="token_stats",
        config_fingerprint=__import__("hashlib").sha256(
            b"pack|v1|96|4096|doc_id|text").hexdigest()[:16],
    )
    assert not r2["completed"] and len(r2["skipped"]) == 3
    ck2 = {
        r["seq_id"]: (r["n_toks"], r["checksum"])
        for r in packed_windows_checkpointed(
            files, work, seq_len=96
        ).take_all()
    }
    assert ck2 == ck
