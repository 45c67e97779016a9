"""Global ordered prefix selection (stages/budget.py): the distributed
bucket-offset running sum must equal a single-process reference and be
invariant to block layout."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dupers_ray.functions.hashing import splitmix64
from dupers_ray.stages.budget import select_token_budget
from dupers_ray.stages.textstats import _TOKEN_RE


def _reference(tbl: pa.Table, budget: int) -> pd.DataFrame:
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    texts = tbl.column("text").to_pylist()
    n = np.array(
        [len(_TOKEN_RE.findall((s or "").lower())) for s in texts], np.int64
    )
    key = splitmix64(ids.view(np.uint64))
    order = np.lexsort((ids, key))
    cum = np.zeros(len(ids), np.int64)
    cum[order] = np.cumsum(n[order])
    return pd.DataFrame({
        "doc_id": ids, "n_tokens": n, "cum_tokens": cum,
        "selected": (cum <= budget).astype(np.int64),
    }).sort_values("doc_id").reset_index(drop=True)


def _got(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_budget_matches_reference(pages_small):
    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    budget = int(_reference(tbl, 0).n_tokens.sum() * 0.4)
    want = _reference(tbl, budget)
    got = _got(select_token_budget(rd.from_arrow(tbl), budget=budget))
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert 0 < want.selected.sum() < len(want)  # non-trivial split


def test_budget_invariant_to_block_layout(pages_small):
    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    a = _got(select_token_budget(rd.from_arrow(tbl), budget=5000))
    b = _got(
        select_token_budget(
            rd.from_arrow(tbl).repartition(37), budget=5000, n_buckets=256
        )
    )
    pd.testing.assert_frame_equal(a, b)
