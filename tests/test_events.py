from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.pipelines.events import hopping_window_agg, sessionize, tumbling_window_agg


def _events():
    base = 1_700_000_000_000_000
    rows = []
    for i in range(200):
        rows.append(
            {
                "ts": base + (i * 137) * 1_000_000,  # 137s apart
                "user_id": i % 7,
                "value": float(i),
            }
        )
    t = pa.table(
        {
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
        }
    )
    return t


def test_tumbling_window_matches_pandas():
    t = _events()
    got = tumbling_window_agg(
        rd.from_arrow(t).repartition(5), window="1h"
    ).to_pandas()
    df = t.to_pandas()
    width = 3600 * 1_000_000
    df["win_start"] = pd.to_datetime(
        (df.ts.astype("int64") // width) * width, unit="us"
    )
    exp = (
        df.groupby(["user_id", "win_start"])["value"]
        .agg(["count", "sum", "min", "max"])
        .reset_index()
    )
    got = got.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "win_start"]).reset_index(drop=True)
    assert got["n"].tolist() == exp["count"].tolist()
    assert np.allclose(got["sum_value"], exp["sum"])
    assert np.allclose(got["min_value"], exp["min"])
    assert np.allclose(got["max_value"], exp["max"])
    assert len(got) == len(exp)


def test_sessionize():
    base = 1_700_000_000_000_000
    rows = {
        "ts": pa.array(
            [base, base + 60_000_000, base + 10_000_000_000,  # user 1: 2 sessions
             base, base + 5_000_000_000],                     # user 2: 2 sessions (gap > 30m? no: 5000s > 1800s yes)
            pa.timestamp("us"),
        ),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = sessionize(ds, gap="30m").to_pandas().sort_values(["user_id", "session_id"])
    u1 = out[out.user_id == 1]
    assert u1["n_events"].tolist() == [2, 1]
    u2 = out[out.user_id == 2]
    assert u2["n_events"].tolist() == [1, 1]


def test_sessionize_string_keys():
    # string user ids (cookie/device ids — the common web case) must route
    # through the hash_str_keys partitioner, not an int cast
    base = 1_700_000_000_000_000
    rows = {
        "ts": pa.array(
            [base, base + 60_000_000, base + 10_000_000_000,
             base, base + 5_000_000_000],
            pa.timestamp("us"),
        ),
        "user_id": pa.array(["cookie-a", "cookie-a", "cookie-a",
                             "dev:b", "dev:b"]),
    }
    ds = rd.from_arrow(pa.table(rows))
    out = sessionize(ds, gap="30m").to_pandas().sort_values(
        ["user_id", "session_id"]
    )
    ua = out[out.user_id == "cookie-a"]
    assert ua["n_events"].tolist() == [2, 1]
    ub = out[out.user_id == "dev:b"]
    assert ub["n_events"].tolist() == [1, 1]


def test_hopping_window_agg(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 2000
    tbl = pa.table({
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "ts": pa.array(1_700_000_000_000_000 + rng.integers(0, 10**10, n),
                       pa.timestamp("us")),
        "value": rng.random(n),
    })
    out = (
        hopping_window_agg(rd.from_arrow(tbl), window="1h", hop="15m")
        .to_pandas()
        .sort_values(["user_id", "win_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", tbl)
    exp = con.execute("""
        WITH ev AS (SELECT user_id, value, epoch_us(ts) AS tus FROM events),
        w AS (SELECT user_id, value,
                     (tus // 900000000) * 900000000 - g.i * 900000000 AS win_us
              FROM ev CROSS JOIN (SELECT unnest(range(4)) AS i) g)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               min(value) AS min_value, max(value) AS max_value,
               make_timestamp(win_us) AS win_start
        FROM w GROUP BY user_id, win_us
        ORDER BY user_id, win_start
    """).df()
    assert len(out) == len(exp)
    assert out.n.tolist() == exp.n.tolist()
    assert np.allclose(out.min_value, exp.min_value)
    assert np.allclose(out.max_value, exp.max_value)
    # every event is counted in exactly window/hop = 4 windows
    assert out.n.sum() == 4 * n


def test_hopping_window_rejects_nonmultiple(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="multiple"):
        hopping_window_agg(rd.range(1), window="1h", hop="7m")


def _funnel_events(n_users=80, seed=11):
    """Random event stream with known funnel truth computed by brute force."""
    rng = np.random.default_rng(seed)
    rows = []
    types = ["signup", "view", "click", "purchase", "error"]
    eid = 0
    for u in range(n_users):
        for _ in range(rng.integers(0, 12)):
            rows.append((eid, int(rng.integers(0, 10_000_000)), u,
                         types[rng.integers(0, len(types))]))
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    return tbl, rows


def _brute_funnel(rows, steps):
    by_user: dict[int, list[tuple[int, str]]] = {}
    for _, ts, u, typ in rows:
        by_user.setdefault(u, []).append((ts, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        t_prev = None
        for i, s in enumerate(steps):
            cand = [ts for ts, typ in evs
                    if typ == s and (t_prev is None or ts > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            counts[i] += 1
    return counts


def test_funnel_counts_matches_bruteforce():
    from dupers_ray.pipelines.events import funnel_counts

    steps = ("signup", "view", "click", "purchase")
    tbl, rows = _funnel_events()
    out = (
        funnel_counts(rd.from_arrow(tbl).repartition(5), steps=steps)
        .to_pandas().sort_values("step_idx").reset_index(drop=True)
    )
    exp = _brute_funnel(rows, steps)
    assert out["step"].tolist() == list(steps)
    assert out["n_users"].tolist() == exp
    # funnel counts are monotone non-increasing by construction
    assert (np.diff(out["n_users"].to_numpy()) <= 0).all()


def test_funnel_counts_strict_ordering():
    from dupers_ray.pipelines.events import funnel_counts

    # same-timestamp view does NOT count (strictly-after semantics)
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([100, 100, 100, 200], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["signup", "view", "signup", "view"], pa.string()),
    })
    out = (
        funnel_counts(rd.from_arrow(tbl), steps=("signup", "view"))
        .to_pandas().sort_values("step_idx")
    )
    assert out["n_users"].tolist() == [2, 1]


def test_funnel_windowed_matches_bruteforce():
    from dupers_ray.pipelines.events import funnel_counts

    steps = ("signup", "view", "click")
    tbl, rows = _funnel_events(seed=3)
    horizon = 3_600_000_000  # 1h in us

    def brute():
        by_user: dict[int, list[tuple[int, str]]] = {}
        for _, ts, u, typ in rows:
            by_user.setdefault(u, []).append((ts, typ))
        counts = [0] * len(steps)
        for evs in by_user.values():
            t0 = None
            t_prev = None
            for i, s in enumerate(steps):
                cand = [
                    ts for ts, typ in evs
                    if typ == s and (t_prev is None or ts > t_prev)
                    and (t0 is None or ts <= t0 + horizon)
                ]
                if not cand:
                    break
                t_prev = min(cand)
                if i == 0:
                    t0 = t_prev
                counts[i] += 1
        return counts

    out = (
        funnel_counts(rd.from_arrow(tbl).repartition(5), steps=steps,
                      within="1h")
        .to_pandas().sort_values("step_idx").reset_index(drop=True)
    )
    assert out["n_users"].tolist() == brute()
    # windowed counts never exceed the unwindowed funnel
    base = (
        funnel_counts(rd.from_arrow(tbl), steps=steps)
        .to_pandas().sort_values("step_idx")
    )
    assert (out["n_users"].to_numpy() <= base["n_users"].to_numpy()).all()


def test_cohort_retention_matches_bruteforce():
    from dupers_ray.pipelines.events import cohort_retention

    rng = np.random.default_rng(4)
    n = 600
    users = rng.integers(0, 60, n)
    ts = rng.integers(0, 40 * 86_400_000_000, n)  # 40 days of events
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })
    out = (
        cohort_retention(rd.from_arrow(tbl).repartition(5), period="7d")
        .to_pandas()
        .sort_values(["cohort_period", "offset_periods"])
        .reset_index(drop=True)
    )
    wk = 7 * 86_400_000_000
    per_user: dict[int, set[int]] = {}
    for u, t in zip(users, ts):
        per_user.setdefault(int(u), set()).add(int(t // wk))
    from collections import Counter

    exp = Counter()
    for weeks in per_user.values():
        c = min(weeks)
        for w in weeks:
            exp[(c, w - c)] += 1
    got = {(r.cohort_period, r.offset_periods): r.n_users
           for r in out.itertuples()}
    assert got == dict(exp)
    # offset-0 cell of each cohort counts the whole cohort
    cohort_sizes = Counter(min(w) for w in per_user.values())
    for c, size in cohort_sizes.items():
        assert got[(c, 0)] == size


def test_window_distinct_matches_bruteforce():
    from dupers_ray.pipelines.events import window_distinct

    rng = np.random.default_rng(9)
    n = 800
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 20 * 86_400_000_000, n)
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })
    out = (
        window_distinct(rd.from_arrow(tbl).repartition(5), window="1d")
        .to_pandas()
    )
    day = 86_400_000_000
    exp: dict[int, set[int]] = {}
    for u, t in zip(users, ts):
        exp.setdefault(int(t // day) * day, set()).add(int(u))
    got = {int(r.win_start.value) // 1000: r.n_distinct
           for r in out.itertuples()}  # .value is ns; windows are us
    assert got == {k: len(v) for k, v in exp.items()}
