"""Per-partition lineage manifests + resumable execution.

The reference's bbolt DB *is* its checkpoint: re-running `dupe` skips
already-hashed paths via ``walkCompare`` (pkg/dupe/dupe.go:940-966), and
`-fast` skips the filesystem entirely. Ray Data has no job-level
checkpoint, so the engine mirrors that semantics at PARTITION granularity
(SURVEY.md §4 'Checkpoint / resume'):

- ``run_partitioned``: embarrassingly-parallel stages (extract, digest,
  signatures, stats) run once per input-file group; each completed
  partition has an atomic output dir (write tmp → rename) plus a manifest
  JSON recording the stage name, config fingerprint, INPUT fingerprint
  (paths + sizes + mtimes), row count and output files. A rerun skips
  partitions whose manifest matches — the partition-level ``walkCompare``.
- ``run_phased``: pipeline-level DAG checkpoints for the wide stages
  (LSH groupby, components) that cannot be partition-wise resumed; each
  phase's Parquet output + manifest gates re-execution.

Manifests double as job metrics (rows in/out per partition — the engine's
`Status()` analogue, dupe.go:375-395).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable, Sequence

import ray.data

MANIFEST_DIR = "_manifests"


def _fingerprint_files(files: Sequence[str]) -> str:
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(int(st.st_mtime)).encode())
    return h.hexdigest()[:32]


def _manifest_path(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{key}.json")


def _load_manifest(out_dir: str, key: str) -> dict | None:
    p = _manifest_path(out_dir, key)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write → treat as incomplete


def _write_manifest(out_dir: str, key: str, data: dict) -> None:
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    p = _manifest_path(out_dir, key)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic on POSIX


def _atomic_write_parquet(ds: "ray.data.Dataset", final_dir: str) -> None:
    """write_parquet into a tmp dir, rename into place. A crashed run
    leaves only tmp dirs, never a half-complete final dir."""
    tmp = final_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    ds.write_parquet(tmp)
    os.replace(tmp, final_dir)


def run_partitioned(
    input_files: Sequence[str],
    out_dir: str,
    pipeline_fn: Callable[["ray.data.Dataset"], "ray.data.Dataset"],
    *,
    stage: str,
    config_fingerprint: str = "",
    files_per_partition: int = 1,
) -> dict:
    """Run ``pipeline_fn`` over groups of input files, one output partition
    each, skipping partitions already completed with matching fingerprints.
    Returns {"completed": [...keys], "skipped": [...keys], "rows": total}."""
    import ray.data as rd

    groups: list[list[str]] = [
        list(input_files[i : i + files_per_partition])
        for i in range(0, len(input_files), files_per_partition)
    ]
    completed, skipped = [], []
    total_rows = 0
    for gi, files in enumerate(groups):
        key = f"partition={gi:05d}"
        fp = _fingerprint_files(files)
        man = _load_manifest(out_dir, key)
        part_dir = os.path.join(out_dir, key)
        if (
            man
            and man.get("status") == "complete"
            and man.get("input_fingerprint") == fp
            and man.get("config_fingerprint") == config_fingerprint
            and man.get("stage") == stage
            and os.path.isdir(part_dir)
        ):
            skipped.append(key)
            total_rows += man.get("rows", 0)
            continue
        ds = pipeline_fn(rd.read_parquet(list(files)))
        ds = ds.materialize()
        rows = ds.count()
        _atomic_write_parquet(ds, part_dir)
        _write_manifest(
            out_dir,
            key,
            {
                "status": "complete",
                "stage": stage,
                "input_files": list(files),
                "input_fingerprint": fp,
                "config_fingerprint": config_fingerprint,
                "rows": rows,
                "completed_at": time.time(),
            },
        )
        completed.append(key)
        total_rows += rows
    return {"completed": completed, "skipped": skipped, "rows": total_rows}


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Read every completed partition back as one Dataset."""
    import glob as _glob

    import ray.data as rd

    files = sorted(
        f
        for d in os.listdir(out_dir)
        if d.startswith("partition=") and not d.endswith(".tmp")
        for f in _glob.glob(os.path.join(out_dir, d, "*.parquet"))
    )
    return rd.read_parquet(files)


def run_phased(
    phases: Sequence[tuple[str, Callable[[dict], "ray.data.Dataset"]]],
    workdir: str,
    *,
    config_fingerprint: str = "",
) -> dict[str, str]:
    """Phase-level checkpointing for wide stages. Each phase fn receives
    {phase_name: output_dir} of all COMPLETED phases and returns a Dataset,
    persisted to ``workdir/<name>/`` atomically. A phase whose manifest
    matches is skipped; downstream phases read its parquet. Returns the
    {phase: dir} map."""
    outputs: dict[str, str] = {}
    for name, fn in phases:
        phase_dir = os.path.join(workdir, name)
        man = _load_manifest(workdir, f"phase-{name}")
        if (
            man
            and man.get("status") == "complete"
            and man.get("config_fingerprint") == config_fingerprint
            and os.path.isdir(phase_dir)
        ):
            outputs[name] = phase_dir
            continue
        ds = fn(dict(outputs))
        ds = ds.materialize()
        rows = ds.count()
        _atomic_write_parquet(ds, phase_dir)
        _write_manifest(
            workdir,
            f"phase-{name}",
            {
                "status": "complete",
                "stage": name,
                "config_fingerprint": config_fingerprint,
                "rows": rows,
                "completed_at": time.time(),
            },
        )
        outputs[name] = phase_dir
    return outputs
