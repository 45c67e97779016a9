"""Snapshot diff: added / removed / changed rows between two corpus (or
index) versions, keyed by id and compared by content digest.

The reference's maintenance loop answers this one row at a time
(walkCompare + Clean, pkg/dupe/dupe.go:940-966 and the db verbs in
pkg/database/database.go); at web scale "what changed between
yesterday's crawl and today's" is a first-class bulk operator feeding
the incremental flagship (dupe_clusters_incremental) and retention
policies on snapshots (state/manifest.snapshot_index).

Shape: both sides carry only (id, digest-prefix-u64, digest) combiner
rows; ONE union + groupby(id-hash partition) co-groups them; the
per-partition compare is a vectorized pandas outer merge (keys exist on
at least one side, so the id column never null-pads — the round-1
dtype-corruption lesson from anti_join_shuffle applies here and is
avoided by construction)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dupers_ray.stages.digest import add_digests, drop_empty

_PARTITIONS = 128


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    content_col: str | None = "text",
    value_col: str | None = None,
) -> "ray.data.Dataset":
    """(id, status) for status in {'added', 'removed', 'changed'};
    unchanged rows are omitted. ``content_col`` compares by SHA-256
    digest (rows with null/empty content are dropped first — the
    reference's ErrFileEmpty contract); pass ``value_col`` instead to
    compare an existing column verbatim."""
    if (content_col is None) == (value_col is None):
        raise ValueError("exactly one of content_col/value_col required")

    def prep(side: str):
        def f(t: pa.Table) -> pa.Table:
            if content_col is not None:
                t = drop_empty(t, content_col=content_col)
                t = add_digests(t, content_col=content_col)
                val = t.column("digest")
            else:
                val = t.column(value_col).cast(pa.string())
            ids = t.column(id_col).cast(pa.int64())
            h = np.asarray(ids, dtype=np.uint64)
            from dupers_ray.functions.hashing import splitmix64

            part = (splitmix64(h) % np.uint64(_PARTITIONS)).astype(np.int64)
            return pa.table({
                id_col: ids,
                "__val": val,
                "__side": pa.array([side] * len(t), pa.string()),
                "__part": pa.array(part),
            })

        return f

    cols = [id_col] + ([content_col] if content_col else [value_col])
    l = old.select_columns(cols).map_batches(
        prep("old"), batch_format="pyarrow", zero_copy_batch=True
    )
    r = new.select_columns(cols).map_batches(
        prep("new"), batch_format="pyarrow", zero_copy_batch=True
    )

    def compare(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["__side"] == "old"][[id_col, "__val"]]
        b = g[g["__side"] == "new"][[id_col, "__val"]]
        m = a.merge(b, on=id_col, how="outer", suffixes=("_old", "_new"))
        old_v, new_v = m["__val_old"], m["__val_new"]
        status = np.where(
            old_v.isna(), "added",
            np.where(new_v.isna(), "removed",
                     np.where(old_v != new_v, "changed", "same")),
        )
        keep = status != "same"
        return pd.DataFrame({
            id_col: m[id_col].to_numpy()[keep],
            "status": status[keep],
        })

    return l.union(r).groupby("__part").map_groups(
        compare, batch_format="pandas"
    )
