"""Bounded-fan-out grouped execution.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per DISTINCT
key — fine for bounded keys (cells, parts), pathological for unbounded
ones: one Python call per doc/domain/gram means 10^6-10^8 interpreter
round-trips at web scale (measured: the per-gram variant burned 16
workers x 17 CPU-min without finishing 600k pages; the partitioned
rewrite finishes in ~6 min). This helper partitions by ``hash(key) %
num_partitions`` instead and invokes ``fn`` once per PARTITION; ``fn``
MUST therefore aggregate per key internally (regroup) — equal keys
always co-locate, so per-partition results are globally exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_GROUP_PARTITIONS = 256


def keyed_partition_map_groups(
    ds: "ray.data.Dataset",
    key_col: str,
    fn,
    *,
    num_partitions: int = DEFAULT_GROUP_PARTITIONS,
    batch_format: str = "pandas",
    coalesce: bool = True,
) -> "ray.data.Dataset":
    """groupby-by-key-hash-range replacement for
    ``ds.groupby(key_col).map_groups(fn)``. ``fn`` receives one frame
    per partition holding EVERY row of each key hashed there and must
    reduce per key itself. Integer keys hash by value; string keys via
    the vectorized string hash (equal keys → equal buckets is all the
    partition needs). ``coalesce`` repartitions to ~2 blocks/CPU first
    (Ray's sort AllToAll pays per-block scheduling — the exact_dedup
    fix)."""

    def add_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kcol = t.column(key_col)
        if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
            from dupers_ray.pipelines.maintenance import hash_str_keys

            keys = hash_str_keys(kcol)
        else:
            # null int keys co-locate in key-0's partition (they stay a
            # DISTINCT group in the per-partition reduce — dropna=False);
            # without the fill np.asarray raises on null-bearing columns
            if kcol.null_count:
                kcol = pc.fill_null(kcol, 0)
            keys = np.asarray(kcol, dtype=np.uint64)
        return t.append_column(
            "__kp",
            pa.array((keys % np.uint64(num_partitions)).astype(np.int64)),
        )

    out = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    if coalesce:
        try:
            import ray as _r

            ncpu = int(_r.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            ncpu = 8
        out = out.repartition(max(8, 2 * ncpu))

    if batch_format == "pandas":
        def wrapped(df):
            return fn(df.drop(columns="__kp"))
    else:
        def wrapped(g: pa.Table) -> pa.Table:
            return fn(g.drop_columns(["__kp"]))

    return out.groupby("__kp").map_groups(wrapped, batch_format=batch_format)


def coalesce_for_group_sort(
    ds: "ray.data.Dataset", num_keys: int
) -> "ray.data.Dataset":
    """Repartition before a sort-based ``groupby(key)`` so every output
    partition is non-empty and TYPED. Ray's sort emits one output
    partition per INPUT block; when reducers approach (or exceed) the
    distinct-key count the sampled range boundaries duplicate and the
    empty ranges materialize as schema-less blocks — the benign-but-noisy
    `RefBundle with a different schema` executor warnings, and a schema
    hazard for downstream unions. Coalescing to ~>=4 keys per reducer
    (capped at 2 blocks/CPU) removes duplicate boundaries unless one key
    holds >25% of all rows. ``num_keys``: the (approximate) distinct-key
    cardinality, e.g. the fan-out constant of a __part-style key.

    Margin note: boundaries are SAMPLE quantiles (~10 samples/reducer),
    so at 4 keys/reducer sampling noise can still collide two adjacent
    boundaries occasionally; 8 keys/reducer was observed collision-free
    across full bench runs while still leaving >=2 blocks/CPU at the
    usual 256-way fan-outs on 32 CPUs."""
    try:
        import ray as _r

        ncpu = int(_r.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        ncpu = 8
    return ds.repartition(max(2, min(2 * ncpu, num_keys // 8)))


def partitioned_aggregate(
    ds: "ray.data.Dataset",
    key_col: str,
    *,
    sums: tuple = (),
    mins: tuple = (),
    maxs: tuple = (),
    having_sum_ge: int | None = None,
    having_col: str | None = None,
    num_partitions: int = DEFAULT_GROUP_PARTITIONS,
) -> "ray.data.Dataset":
    """``ds.groupby(key).aggregate(Sum/Min/Max)`` replacement for
    UNBOUNDED key cardinality: Ray's aggregate is a sort-based AllToAll
    over every partial row (measured 111 s -> 5.6 s on 13M chunk rows,
    round-3 verdict #6); this hash-partitions on the key and reduces
    each partition with one pandas C-speed hash groupby. Column names
    pass through unchanged (no ``sum(x)`` renames). With
    ``having_sum_ge``, rows where ``having_col``'s global sum is below
    the bound are dropped IN-partition — the reduction output leaves the
    cluster, the raw keys don't. Works for int AND string keys (string
    keys hash-partition without a global string sort)."""
    specs = list(sums) + list(mins) + list(maxs)
    if len(set(specs)) != len(specs):
        raise ValueError(
            "partitioned_aggregate: sums/mins/maxs column sets must be "
            f"pairwise disjoint, got sums={sums} mins={mins} maxs={maxs}"
        )
    agg_map = {c: "sum" for c in sums}
    agg_map.update({c: "min" for c in mins})
    agg_map.update({c: "max" for c in maxs})

    def reduce_part(df):
        # dropna=False: a null key is a real group (SQL GROUP BY / Ray
        # aggregate parity) — pandas' default silently deletes those rows
        out = df.groupby(
            key_col, sort=False, as_index=False, dropna=False
        ).agg(agg_map)
        if having_sum_ge is not None:
            out = out[out[having_col] >= having_sum_ge]
        return out

    return keyed_partition_map_groups(
        ds, key_col, reduce_part,
        num_partitions=num_partitions, batch_format="pandas",
    )
