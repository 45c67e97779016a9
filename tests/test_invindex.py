from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.pipelines.invindex import (
    build_token_index,
    indexed_token_search,
)

_TOK = re.compile(r"[a-z0-9_]+")


def _docs():
    texts = [
        "alpha beta gamma", "beta delta", "alpha delta epsilon",
        "zeta", "", None, "ALPHA Beta",  # case folds; empties indexed as nothing
        "alpha alpha beta beta",         # repeated tokens -> one posting each
    ]
    return texts, rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)


def _brute(texts, terms, mode):
    hits = []
    for i, t in enumerate(texts):
        toks = set(_TOK.findall((t or "").lower()))
        ok = all(x in toks for x in terms) if mode == "all" else any(
            x in toks for x in terms
        )
        if ok:
            hits.append(i)
    return sorted(hits)


def test_indexed_search_matches_bruteforce(tmp_path):
    texts, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    assert any(d.startswith("part=") for d in os.listdir(idx))
    for terms in (["alpha"], ["alpha", "beta"], ["alpha", "delta"],
                  ["zeta", "alpha"]):
        for mode in ("all", "any"):
            out = indexed_token_search(idx, terms, mode=mode, partitions=8)
            exp = _brute(texts, terms, mode)
            if not exp:  # empty Dataset loses its schema on collect
                assert out.count() == 0, (terms, mode)
                continue
            got = sorted(out.to_pandas()["doc_id"].tolist())
            assert got == exp, (terms, mode)


def test_indexed_search_absent_term_empty(tmp_path):
    texts, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    assert indexed_token_search(idx, ["nosuchtoken"], partitions=8).count() == 0
    # AND with an absent term is empty even when the other term matches
    assert indexed_token_search(
        idx, ["alpha", "nosuchtoken"], partitions=8
    ).count() == 0
    # ...but ANY still returns the alpha docs
    got = sorted(indexed_token_search(
        idx, ["alpha", "nosuchtoken"], mode="any", partitions=8
    ).to_pandas()["doc_id"].tolist())
    assert got == _brute(texts, ["alpha"], "any")


def test_index_postings_distinct(tmp_path):
    _, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    t = rd.read_parquet(idx).to_pandas()
    assert not t.duplicated(["th", "doc_id"]).any()
