"""revenue_rollup: combiner + cogroup join + broadcast dimension vs pandas."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from dupers_ray.pipelines.relational import (
    apply_lookup,
    broadcast_lookup,
    revenue_rollup,
)


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(7)
    n_cust, n_ord = 40, 500
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_mktsegment": [f"SEG{i % 4}" for i in range(n_cust)],
            "c_nationkey": (rng.integers(0, 5, n_cust)).astype(np.int32),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
            "o_totalprice": rng.uniform(1, 1000, n_ord).round(2),
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(5, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(5)],
        }
    )
    return orders, customer, nation


def test_segment_rollup_matches_pandas(tables):
    orders, customer, nation = tables
    got = (
        revenue_rollup(rd.from_pandas(orders), rd.from_pandas(customer))
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    exp = (
        orders.merge(customer, left_on="o_custkey", right_on="c_custkey")
        .groupby("c_mktsegment")
        .agg(n_orders=("o_orderkey", "size"), revenue=("o_totalprice", "sum"))
        .reset_index()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    assert list(got["c_mktsegment"]) == list(exp["c_mktsegment"])
    assert list(got["n_orders"]) == list(exp["n_orders"])
    np.testing.assert_allclose(got["revenue"], exp["revenue"], rtol=1e-9)


def test_nation_rollup_broadcast(tables):
    orders, customer, nation = tables
    got = (
        revenue_rollup(
            rd.from_pandas(orders),
            rd.from_pandas(customer),
            nation=rd.from_pandas(nation),
        )
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    exp = (
        orders.merge(customer, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name")
        .agg(n_orders=("o_orderkey", "size"), revenue=("o_totalprice", "sum"))
        .reset_index()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert list(got["n_name"]) == list(exp["n_name"])
    assert list(got["n_orders"]) == list(exp["n_orders"])
    np.testing.assert_allclose(got["revenue"], exp["revenue"], rtol=1e-9)


def test_lookup_miss_raises(tables):
    _, _, nation = tables
    ref = broadcast_lookup(
        rd.from_pandas(nation), key_col="n_nationkey", value_col="n_name"
    )
    bad = rd.from_arrow(pa.table({"c_nationkey": pa.array([99], pa.int32())}))
    with pytest.raises(Exception, match="lookup misses"):
        apply_lookup(bad, ref, key_col="c_nationkey", out_col="n_name").take_all()


def test_pricing_summary_integer_exact(ray_session):
    import numpy as np

    from dupers_ray.pipelines.relational import pricing_summary

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table(
        {
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n)),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(float)),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 100000, n), 2)
            ),
            "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
        }
    )
    out4 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary(
            rd.from_arrow(t).repartition(4)
        ).take_all()
    }
    out13 = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pricing_summary(
            rd.from_arrow(t).repartition(13)
        ).take_all()
    }
    assert out4 == out13  # bit-exact at any parallelism (integer units)

    price = np.rint(t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
    disc = np.rint(t.column("l_discount").to_numpy() * 100).astype(np.int64)
    tax = np.rint(t.column("l_tax").to_numpy() * 100).astype(np.int64)
    flags = t.column("l_returnflag").to_pylist()
    stats = t.column("l_linestatus").to_pylist()
    for key, row in out4.items():
        m = np.array([(f, s) == key for f, s in zip(flags, stats)])
        assert row["n"] == int(m.sum())
        assert row["sum_base_cents"] == int(price[m].sum())
        assert row["sum_disc_e4"] == int((price[m] * (100 - disc[m])).sum())
        assert row["sum_charge_e6"] == int(
            (price[m] * (100 - disc[m]) * (100 + tax[m])).sum()
        )


def test_order_priority_exists_matches_duckdb(ray_session):
    import duckdb

    from dupers_ray.pipelines.relational import order_priority_exists

    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(f"{sf}/orders.parquet")
    lineitem = rd.read_parquet(f"{sf}/lineitem.parquet")
    out = (
        order_priority_exists(orders, lineitem)
        .to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    )
    exp = duckdb.sql(f"""
        SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM read_parquet('{sf}/orders.parquet') o
        WHERE EXISTS (SELECT 1 FROM read_parquet('{sf}/lineitem.parquet') l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """).df()
    assert out.equals(exp.astype(out.dtypes.to_dict()))


def test_order_priority_exists_shuffle_path(ray_session):
    from dupers_ray.pipelines.relational import order_priority_exists

    sf = "/root/testdata/sf0.001"
    orders = rd.read_parquet(f"{sf}/orders.parquet")
    lineitem = rd.read_parquet(f"{sf}/lineitem.parquet")
    a = (order_priority_exists(orders, lineitem)
         .to_pandas().sort_values("o_orderpriority").reset_index(drop=True))
    b = (order_priority_exists(orders, lineitem, broadcast_limit=0)
         .to_pandas().sort_values("o_orderpriority").reset_index(drop=True))
    assert a.equals(b)
