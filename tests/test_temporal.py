"""Temporal joins (pipelines/temporal.py): as-of join and banded range
join checked against brute-force references and DuckDB on random data."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from dupers_ray.pipelines.temporal import asof_join, range_join_banded

def _collect(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Collect via Arrow with nullable Int64 (Dataset.to_pandas would
    coerce null-padded int64 to float64 and corrupt >2^53 ids)."""
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return tbl.to_pandas(types_mapper={pa.int64(): pd.Int64Dtype()}.get)


LEFT_SCHEMA = pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", pa.int64())])
RIGHT_SCHEMA = pa.schema([("k", pa.int64()), ("ts", pa.int64()), ("aid", pa.int64()),
                          ("aval", pa.float64())])


def _rand_tables(seed: int, nl: int = 400, nr: int = 120, nkeys: int = 7):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "eid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, nkeys, nl).astype(np.int64),
        "ts": rng.integers(0, 10_000, nl).astype(np.int64),
    })
    right = pa.table({
        "k": rng.integers(0, nkeys, nr).astype(np.int64),
        "ts": rng.integers(0, 10_000, nr).astype(np.int64),
        "aid": (np.arange(nr, dtype=np.int64) + (1 << 60)),  # >2^53: float64 would corrupt
        "aval": rng.random(nr),
    })
    return left, right


def _asof_brute(left: pa.Table, right: pa.Table) -> pd.DataFrame:
    l, r = left.to_pandas(), right.to_pandas()
    rows, aids = [], []
    for row in l.itertuples(index=False):
        cand = r[(r.k == row.k) & (r.ts <= row.ts)]
        if len(cand):
            # max ts, ties broken by max aid; scalar .at access — a row
            # Series (.iloc[-1]) would upcast int64 aid to float64
            bi = cand.sort_values(["ts", "aid"]).index[-1]
            rows.append((row.eid, row.k, row.ts, float(r.at[bi, "aval"])))
            aids.append(int(r.at[bi, "aid"]))
        else:
            rows.append((row.eid, row.k, row.ts, None))
            aids.append(None)
    df = pd.DataFrame(rows, columns=["eid", "k", "ts", "aval"])
    # Int64 from the start: a float64 column would round ids >2^53
    df.insert(3, "aid", pd.array(aids, dtype="Int64"))
    return df


@pytest.mark.parametrize("seed", [1, 2])
def test_asof_join_matches_brute_force(ray_session, seed):
    left, right = _rand_tables(seed)
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts="ts", left_schema=LEFT_SCHEMA, right_schema=RIGHT_SCHEMA,
        tiebreak="aid", num_partitions=8,
    )
    out = _collect(out).sort_values("eid").reset_index(drop=True)
    exp = _asof_brute(left, right).sort_values("eid").reset_index(drop=True)
    assert str(out["aid"].dtype) == "Int64"  # exact big ints survive null padding
    pd.testing.assert_frame_equal(
        out, exp.astype({c: "Int64" for c in ["eid", "k", "ts", "aid"]}),
        check_dtype=False,
    )


def test_asof_join_empty_right(ray_session):
    left, right = _rand_tables(3)
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right.slice(0, 0)),
        key="k", ts="ts", left_schema=LEFT_SCHEMA, right_schema=RIGHT_SCHEMA,
        num_partitions=4,
    ).to_pandas()
    assert len(out) == left.num_rows
    assert out["aid"].isna().all()


def test_asof_join_ties_deterministic(ray_session):
    left = pa.table({"eid": [0], "k": [5], "ts": [100]})
    right = pa.table({"k": [5, 5, 5], "ts": [100, 100, 50],
                      "aid": [7, 9, 1], "aval": [0.1, 0.2, 0.3]})
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts="ts", left_schema=LEFT_SCHEMA, right_schema=RIGHT_SCHEMA,
        tiebreak="aid",
    ).to_pandas()
    assert out["aid"].tolist() == [9]  # max tiebreak among equal ts wins


def test_asof_join_rejects_column_collision(ray_session):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            ray.data.range(1), ray.data.range(1), key="k", ts="ts",
            left_schema=pa.schema([("k", pa.int64()), ("ts", pa.int64()), ("x", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("ts", pa.int64()), ("x", pa.int64())]),
        )


def _range_brute(left: pa.Table, right: pa.Table) -> set[tuple[int, int]]:
    l, r = left.to_pandas(), right.to_pandas()
    out = set()
    for lr in l.itertuples(index=False):
        for rr in r.itertuples(index=False):
            if lr.k == rr.k and rr.s <= lr.ts < rr.e:
                out.add((lr.eid, rr.rid))
    return out


RL_SCHEMA = pa.schema([("eid", pa.int64()), ("k", pa.int64()), ("ts", pa.int64())])
RR_SCHEMA = pa.schema([("k", pa.int64()), ("s", pa.int64()), ("e", pa.int64()),
                       ("rid", pa.int64())])


@pytest.mark.parametrize("band_us", [16, 100, 1000, 7])
def test_range_join_banded_matches_brute_force(ray_session, band_us):
    rng = np.random.default_rng(band_us)
    nl, nr = 300, 80
    left = pa.table({
        "eid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, 5, nl).astype(np.int64),
        "ts": rng.integers(0, 3000, nl).astype(np.int64),
    })
    s = rng.integers(0, 3000, nr).astype(np.int64)
    right = pa.table({
        "k": rng.integers(0, 5, nr).astype(np.int64),
        "s": s,
        "e": s + rng.integers(1, 500, nr).astype(np.int64),
        "rid": np.arange(nr, dtype=np.int64),
    })
    out = range_join_banded(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts="ts", start="s", end="e", band_us=band_us,
        left_schema=RL_SCHEMA, right_schema=RR_SCHEMA, num_partitions=8,
    ).to_pandas()
    got = set(zip(out.eid.tolist(), out.rid.tolist()))
    assert len(got) == len(out), "duplicate pairs emitted"
    assert got == _range_brute(left, right)


def test_range_join_timestamp_columns(ray_session):
    """timestamp[us] columns compare identically to their int64 micros."""
    base = 1_700_000_000_000_000
    left = pa.table({
        "eid": pa.array([0, 1, 2], pa.int64()),
        "k": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([base + 10, base + 150, base + 500], pa.timestamp("us")),
    })
    right = pa.table({
        "k": pa.array([1], pa.int64()),
        "s": pa.array([base + 100], pa.timestamp("us")),
        "e": pa.array([base + 400], pa.timestamp("us")),
        "rid": pa.array([99], pa.int64()),
    })
    out = range_join_banded(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts="ts", start="s", end="e", band_us=64,
        left_schema=left.schema, right_schema=right.schema, num_partitions=4,
    ).to_pandas()
    assert out.eid.tolist() == [1] and out.rid.tolist() == [99]


def test_asof_vs_duckdb_on_events_shape(ray_session):
    """Same shape the driver query uses, cross-checked with DuckDB ASOF."""
    rng = np.random.default_rng(11)
    n = 500
    ev = pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": pa.array(1_700_000_000_000_000 + rng.integers(0, 10**9, n),
                       pa.timestamp("us")),
        "event_type": rng.choice(["view", "purchase"], n).tolist(),
        "value": rng.random(n),
    })
    lsch = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                      ("ts", pa.timestamp("us"))])
    rsch = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us")),
                      ("anchor_id", pa.int64()), ("anchor_value", pa.float64())])
    left = ray.data.from_arrow(ev.select(["event_id", "user_id", "ts"]))
    import pyarrow.compute as pc
    anchors = ev.filter(pc.equal(ev.column("event_type"), "purchase"))
    right_tbl = pa.table({
        "user_id": anchors.column("user_id"), "ts": anchors.column("ts"),
        "anchor_id": anchors.column("event_id"), "anchor_value": anchors.column("value"),
    })
    out = asof_join(
        left, ray.data.from_arrow(right_tbl), key="user_id", ts="ts",
        left_schema=lsch, right_schema=rsch, tiebreak="anchor_id", num_partitions=8,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", ev)
    exp = con.execute("""
        SELECT e.event_id, e.user_id, e.ts, a.event_id AS anchor_id,
               a.value AS anchor_value
        FROM events e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') a
          ON e.user_id = a.user_id AND a.ts <= e.ts
        ORDER BY e.event_id
    """).df()
    assert out["anchor_id"].astype("Int64").equals(exp["anchor_id"].astype("Int64"))
    lhs = out["anchor_value"].fillna(-1).to_numpy()
    rhs = exp["anchor_value"].fillna(-1).to_numpy()
    assert np.allclose(lhs, rhs)
