"""JSONL (newline-delimited JSON) source/sink.

Interchange format parity beyond CSV (S7/S8 in SURVEY §2): web-pipeline
corpora very often arrive as .jsonl shards. Ray Data's native
``write_json`` / ``read_json`` do the heavy lifting (one file per block,
Arrow JSON reader); this wrapper pins the two lossy edges:

- timestamps: serialized as ISO-8601 strings on write and re-parsed on
  read (raw epoch-int round-trips are reader-version-dependent);
- dtype drift: ``read_jsonl`` re-casts to an explicit schema when given
  (JSON has no int32/float distinction).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _ts_to_iso(t: pa.Table) -> pa.Table:
    for i, f in enumerate(t.schema):
        if pa.types.is_timestamp(f.type):
            # Arrow strftime's %S already carries the fractional seconds
            iso = pc.strftime(t.column(i), format="%Y-%m-%dT%H:%M:%S")
            t = t.set_column(i, f.name, iso)
    return t


def write_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """One .json file per block (resumable layout — rerun overwrites
    whole files, never appends)."""
    ds.map_batches(_ts_to_iso, batch_format="pyarrow").write_json(path)


def read_jsonl(
    paths: str | list[str], *, schema: pa.Schema | None = None,
) -> "ray.data.Dataset":
    ds = ray.data.read_json(paths)
    if schema is None:
        return ds

    def recast(t: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            c = t.column(f.name)
            # ISO-8601 strings cast directly to timestamp (Arrow strptime
            # lacks %f); already-inferred timestamps cast through too
            cols[f.name] = c.cast(f.type)
        return pa.table(cols)

    return ds.map_batches(recast, batch_format="pyarrow")
