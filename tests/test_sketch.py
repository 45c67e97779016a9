"""HyperLogLog + exact distinct (stages/sketch.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dupers_ray.stages.sketch import (
    distinct_count,
    hll_estimate,
    hll_partial,
    hll_registers,
)


def _merge(parts: list[pa.Table], p: int) -> pa.Table:
    m = 1 << p
    reg = np.zeros(m, np.int64)
    for t in parts:
        np.maximum.at(reg, np.asarray(t.column("idx")), np.asarray(t.column("rho")))
    nz = np.flatnonzero(reg)
    return pa.table({"idx": pa.array(nz, pa.int64()), "rho": pa.array(reg[nz], pa.int64())})


@pytest.mark.parametrize("n,tol", [(100, 0.05), (5000, 0.05), (50000, 0.04)])
def test_hll_error_bound(n, tol):
    vals = [f"tok_{i}" for i in range(n)]
    t = pa.table({"v": pa.array(vals, pa.string())})
    est = hll_estimate(hll_partial(t, col="v"), p=12)
    assert abs(est - n) / n < tol  # p=12 → σ ≈ 1.6%


def test_hll_merge_equals_single_pass():
    vals = [f"x{i}" for i in range(30000)]
    whole = hll_partial(pa.table({"v": vals}), col="v")
    parts = [
        hll_partial(pa.table({"v": vals[i::3]}), col="v") for i in range(3)
    ]
    merged = _merge(parts, 12)
    assert merged.sort_by("idx").equals(whole.sort_by("idx"))


def test_hll_duplicate_invariance():
    uniq = [f"d{i}" for i in range(2000)]
    dup = uniq * 7
    a = hll_partial(pa.table({"v": uniq}), col="v")
    b = hll_partial(pa.table({"v": dup}), col="v")
    assert a.sort_by("idx").equals(b.sort_by("idx"))


def test_hll_int_hash_kind():
    ids = pa.table({"v": pa.array(range(20000), pa.int64())})
    est = hll_estimate(hll_partial(ids, col="v", hash_kind="int"), p=12)
    assert abs(est - 20000) / 20000 < 0.05


def test_hll_rejects_bad_p():
    with pytest.raises(ValueError, match="p must be"):
        hll_partial(pa.table({"v": ["a"]}), col="v", p=13)


def test_hll_registers_dataset_matches_kernel(ray_session):
    vals = [f"w{i % 4000}" for i in range(20000)]  # duplicates across blocks
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    got = pa.concat_tables(
        hll_registers(ds, col="v").iter_batches(batch_format="pyarrow")
    ).sort_by("idx")
    exp = hll_partial(pa.table({"v": list(dict.fromkeys(vals))}), col="v").sort_by("idx")
    assert got.equals(exp)


def test_distinct_count_exact(ray_session):
    import duckdb

    vals = [f"t{i % 1234}" for i in range(10000)]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    out = distinct_count(ds, col="v")
    assert out.column("n_distinct").to_pylist() == [1234]
    assert duckdb.sql("SELECT count(DISTINCT v) FROM (SELECT unnest(?) AS v)",
                      params=[vals]).fetchone()[0] == 1234


def test_bloom_no_false_negatives_and_merge(ray_session):
    import numpy as np

    from dupers_ray.functions.hashing import hash_str_u64
    from dupers_ray.stages.sketch import (
        bloom_build_tokens,
        bloom_contains,
        bloom_from_hashes,
    )

    texts = [f"alpha{i} beta{i % 7} gamma" for i in range(300)]
    vocab = sorted({t for s in texts for t in s.split()})
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(5)
    bm = bloom_build_tokens(ds, m_bits=1 << 12, k=4)

    # every member hits (no false negatives, regardless of partitioning)
    assert bloom_contains(bm, hash_str_u64(vocab), k=4).all()
    # distributed OR-merge == single-shot build over the whole vocabulary
    solo = bloom_from_hashes(hash_str_u64(vocab), m_bits=1 << 12, k=4)
    assert np.array_equal(bm, solo)
    # non-members nearly all miss at this sizing (fp rate ~(n*k/m)^k)
    miss = bloom_contains(
        bm, hash_str_u64([f"zz{i}" for i in range(2000)]), k=4
    )
    assert miss.sum() < 20
    # retry idempotence: OR-ing the filter with itself changes nothing
    assert np.array_equal(bm | solo, bm)


def test_global_value_ranks_matches_pandas():
    import pandas as pd
    import ray.data as rd
    from dupers_ray.stages.sketch import global_value_ranks

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 40, 500)  # heavy ties
    tbl = pa.table({
        "doc_id": pa.array(np.arange(500), pa.int64()),
        "n_chars": pa.array(vals, pa.int64()),
    })
    out = (
        global_value_ranks(rd.from_arrow(tbl).repartition(6),
                           value_col="n_chars")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    df = pd.DataFrame({"doc_id": np.arange(500), "n_chars": vals})
    exp_rank = df["n_chars"].rank(method="min").astype("int64") - 1
    exp_eq = df.groupby("n_chars")["n_chars"].transform("size").astype("int64")
    assert (out["rank_lt"].to_numpy() == exp_rank.to_numpy()).all()
    assert (out["n_eq"].to_numpy() == exp_eq.to_numpy()).all()
    assert (out["pct_ppm"].to_numpy()
            == exp_rank.to_numpy() * 1_000_000 // 500).all()


def test_cms_never_undercounts_and_merge_equals_single_pass():
    import ray.data as rd
    from collections import Counter

    from dupers_ray.stages.sketch import cms_estimate, cms_token_counts

    texts = [f"tok{i % 37} tok{i % 11} filler" for i in range(400)]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    truth = Counter()
    for t in texts:
        truth.update(t.split())
    grid_multi = cms_token_counts(rd.from_arrow(tbl).repartition(7))
    grid_single = cms_token_counts(rd.from_arrow(tbl).repartition(1))
    assert (grid_multi == grid_single).all()  # sum-merge == single pass
    assert grid_multi.sum() == 4 * sum(truth.values())  # mass conservation
    toks = sorted(truth)
    est = cms_estimate(grid_multi, toks)
    exact = np.array([truth[t] for t in toks])
    assert (est >= exact).all()  # CMS never under-counts
    # wide sketch vs tiny vocab: most estimates exact
    assert (est == exact).mean() > 0.9
