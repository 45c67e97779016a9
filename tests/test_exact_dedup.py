"""Exact dedup pipeline tests on the synthetic pages corpus.

The corpus (synth.py) plants exact-dup clusters; ground truth is returned
with it, so recall/precision are checked without an external oracle —
mirrors the reference's TestDupeCommand
(/root/reference/pkg/database/database_dupe_test.go:18-117) which builds
buckets with known duplicate files.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from dupers_ray.pipelines.exact_dedup import exact_canonical, exact_dupe_pairs


def _expected_exact_pairs(pages: pa.Table, truth: pa.Table) -> set[tuple[str, str]]:
    df = pages.select(["url", "text"]).to_pandas().merge(truth.to_pandas(), on="url")
    out = set()
    for _, sub in df.groupby("text", sort=False):
        if len(sub) < 2:
            continue
        urls = sorted(sub["url"])
        out.update((urls[0], u) for u in urls[1:])
    return out


def test_exact_pairs_match_truth(pages_small):
    ds = rd.from_arrow(pages_small.pages).repartition(8)
    got = exact_dupe_pairs(ds).to_pandas()
    got_pairs = set(zip(got["url"], got["match_url"]))
    exp = _expected_exact_pairs(pages_small.pages, pages_small.truth)
    # empty-text rows are dropped by the pipeline (ErrFileEmpty parity);
    # the brute-force includes only non-empty groups of size >= 2
    exp = {(a, b) for a, b in exp if a}  # defensive; all urls non-empty
    # remove pairs whose text was empty (edge rows)
    texts = dict(zip(pages_small.pages["url"].to_pylist(),
                     pages_small.pages["text"].to_pylist()))
    exp = {(a, b) for a, b in exp if texts[a] != ""}
    assert got_pairs == exp
    assert len(got_pairs) > 0  # corpus plants exact dups


def test_exact_canonical_counts(pages_small):
    ds = rd.from_arrow(pages_small.pages).repartition(8)
    canon = exact_canonical(ds).to_pandas()
    # canonical rows = number of distinct non-empty texts
    texts = [t for t in pages_small.pages["text"].to_pylist() if t]
    assert len(canon) == len(set(texts))
    assert (canon["n_dups"] >= 1).all()
    # canonical id is the min url of its digest group
    df = pd.DataFrame(
        {
            "url": pages_small.pages["url"].to_pylist(),
            "text": pages_small.pages["text"].to_pylist(),
        }
    )
    df = df[df.text != ""]
    exp_min = df.groupby("text")["url"].min()
    assert set(canon["url"]) == set(exp_min)


def test_determinism_across_partitioning(pages_small):
    ds1 = rd.from_arrow(pages_small.pages).repartition(2)
    ds2 = rd.from_arrow(pages_small.pages).repartition(13)
    p1 = exact_dupe_pairs(ds1).to_pandas().sort_values(["url", "match_url"]).reset_index(drop=True)
    p2 = exact_dupe_pairs(ds2).to_pandas().sort_values(["url", "match_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)


def test_soft_dedup_weights_sum_to_distinct_count():
    """Σ weight == number of distinct contents (each group contributes
    n * 1/n = 1), and every member of a group carries the same weight."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.exact_dedup import soft_dedup_weights

    texts = [f"content {i % 7}" for i in range(60)] + ["", None]
    t = pa.table({
        "doc_id": pa.array(np.arange(62, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    rows = soft_dedup_weights(
        rd.from_arrow(t).repartition(5), id_col="doc_id", content_col="text"
    ).take_all()
    assert len(rows) == 60  # empty/null text dropped, dups all kept
    assert abs(sum(r["weight"] for r in rows) - 7) < 1e-9
    by_content = {}
    for r in rows:
        by_content.setdefault(r["doc_id"] % 7, set()).add(
            (r["n_dups"], round(r["weight"], 12))
        )
    for grp in by_content.values():
        assert len(grp) == 1  # uniform within group
