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


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (bm25_scores)
# ---------------------------------------------------------------------------


def _brute_bm25(texts, terms, k1=1.2, b=0.75):
    n = float(len(texts))
    tok_lists = [_TOK.findall((t or "").lower()) for t in texts]
    dls = [float(len(ts)) for ts in tok_lists]
    avgdl = sum(dls) / n
    df = {
        q: float(sum(1 for ts in tok_lists if q in ts)) for q in terms
    }
    out = {}
    for i, ts in enumerate(tok_lists):
        s = 0.0
        for q in terms:
            tf = float(ts.count(q))
            if not tf:
                continue
            idf = np.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)
                        / (tf + k1 * (1.0 - b + b * dls[i] / avgdl)))
        if s:
            out[i] = s
    return out


def test_bm25_matches_bruteforce(tmp_path):
    from dupers_ray.pipelines.invindex import bm25_scores

    texts, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    assert os.path.exists(os.path.join(idx, "_stats.json"))
    got = bm25_scores(idx, ["alpha", "beta"], partitions=8).to_pandas()
    exp = _brute_bm25(texts, ["alpha", "beta"])
    assert sorted(got["doc_id"]) == sorted(exp)
    for _, row in got.iterrows():
        assert abs(row["score"] - exp[int(row["doc_id"])]) < 1e-9


def test_bm25_tf_saturation_and_ranking(tmp_path):
    """Doc 7 ('alpha alpha beta beta') must outrank doc 0 ('alpha beta
    gamma') on tf, but k1 saturation keeps the margin sublinear."""
    from dupers_ray.pipelines.invindex import bm25_scores

    texts, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    got = bm25_scores(idx, ["alpha", "beta"], partitions=8).to_pandas()
    s = dict(zip(got["doc_id"].astype(int), got["score"]))
    assert s[7] > s[0]
    assert s[7] < 2.0 * s[0]


def test_bm25_unknown_term_scores_nothing(tmp_path):
    from dupers_ray.pipelines.invindex import bm25_scores

    _, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    got = bm25_scores(idx, ["nosuchtoken"], partitions=8).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# Incremental index maintenance (update_token_index)
# ---------------------------------------------------------------------------


def test_update_token_index_equals_full_build(tmp_path):
    from dupers_ray.pipelines.invindex import (
        bm25_scores,
        build_token_index,
        update_token_index,
    )

    texts, ds = _docs()
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_token_index(ds.filter(expr="doc_id < 4"), inc, partitions=8)
    n_new = update_token_index(ds, inc, partitions=8)
    assert n_new == len(texts) - 4
    build_token_index(ds, full, partitions=8)

    for terms in (["alpha"], ["alpha", "beta"]):
        a = bm25_scores(inc, terms, partitions=8).to_pandas()
        b = bm25_scores(full, terms, partitions=8).to_pandas()
        ka = sorted(zip(a["doc_id"], a["score"].round(9)))
        kb = sorted(zip(b["doc_id"], b["score"].round(9)))
        assert ka == kb
        got = sorted(indexed_token_search(inc, terms, partitions=8)
                     .to_pandas()["doc_id"])
        exp = sorted(indexed_token_search(full, terms, partitions=8)
                     .to_pandas()["doc_id"])
        assert got == exp


def test_update_token_index_idempotent(tmp_path):
    from dupers_ray.pipelines.invindex import (
        build_token_index,
        update_token_index,
    )
    import json

    _, ds = _docs()
    idx = str(tmp_path / "idx")
    build_token_index(ds, idx, partitions=8)
    with open(os.path.join(idx, "_stats.json")) as f:
        before = json.load(f)
    assert update_token_index(ds, idx, partitions=8) == 0
    with open(os.path.join(idx, "_stats.json")) as f:
        assert json.load(f) == before


# ---------------------------------------------------------------------------
# Positional phrase search (build_phrase_index / phrase_search)
# ---------------------------------------------------------------------------


def test_phrase_search_matches_bruteforce(tmp_path):
    from dupers_ray.pipelines.invindex import build_phrase_index, phrase_search

    texts = [
        "alpha beta gamma alpha beta",      # 'alpha beta' twice
        "beta alpha beta gamma",            # once (positions 1-2)
        "alpha gamma beta",                 # never adjacent
        "alpha beta",                       # once
        "",
        None,
        "beta beta beta",                   # repeated-term phrase fodder
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    idx = str(tmp_path / "pidx")
    build_phrase_index(ds, idx, partitions=8)

    def brute(phrase):
        out = {}
        for i, t in enumerate(texts):
            toks = _TOK.findall((t or "").lower())
            n = sum(
                1 for j in range(len(toks) - len(phrase) + 1)
                if toks[j: j + len(phrase)] == phrase
            )
            if n:
                out[i] = n
        return out

    for phrase in (["alpha", "beta"], ["beta", "gamma"],
                   ["beta", "beta"], ["alpha", "beta", "gamma"],
                   ["gamma", "zeta"], ["alpha"]):
        got = phrase_search(idx, phrase, partitions=8).to_pandas()
        exp = brute(phrase)
        if "doc_id" not in got.columns:   # zero-row blocks lose schema
            assert len(got) == 0 and exp == {}, phrase
            continue
        assert dict(zip(got["doc_id"].astype(int), got["n_matches"].astype(int))) == exp, phrase
