from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

from dupers_ray.stages.ngram import exact_jaccard, shingle_set, verify_pairs_exact
from dupers_ray.stages.suffix import (
    _sa_contains,
    build_suffix_array,
    multi_term_search,
)


def test_build_suffix_array_banana():
    sa = build_suffix_array(b"banana")
    # suffixes sorted: a, ana, anana, banana, na, nana → positions 5,3,1,0,4,2
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=120), st.binary(min_size=1, max_size=5))
def test_sa_contains_matches_naive(data, term):
    sa = build_suffix_array(data)
    got = set(_sa_contains(data, sa, term).tolist())
    naive = set()
    start = 0
    while True:
        i = data.find(term, start)
        if i < 0:
            break
        naive.add(i)
        start = i + 1
    assert got == naive


def test_multi_term_search_matches_scan(pages_small):
    ds = rd.from_arrow(pages_small.pages).repartition(4)
    terms = ["data batch", "shuffle", "zzz-not-present", "near exact"]
    got = multi_term_search(ds, terms).to_pandas()
    texts = dict(
        zip(pages_small.pages["url"].to_pylist(), pages_small.pages["text"].to_pylist())
    )
    for term in terms:
        exp = {u for u, t in texts.items() if term in t}
        have = set(got[got.term == term]["url"])
        assert have == exp, term


def test_exact_jaccard():
    assert exact_jaccard("a b c d e f", "a b c d e f", k=3) == 1.0
    assert exact_jaccard("a b c", "x y z", k=3) == 0.0
    assert exact_jaccard("", "", k=3) == 1.0
    assert exact_jaccard("a b", "", k=3) == 0.0
    j = exact_jaccard("a b c d e", "a b c d x", k=3)
    assert 0 < j < 1


def test_verify_pairs_exact(pages_small):
    """Exact verification of near-dup candidates agrees with per-pair
    brute force."""
    from dupers_ray.config import DedupConfig
    from dupers_ray.functions.hashing import node_ids
    from dupers_ray.pipelines.near_dedup import near_dup_edges

    cfg = DedupConfig()
    ds = rd.from_arrow(pages_small.pages)
    edges, _sigs = near_dup_edges(ds, shingle=cfg.shingle, minhash=cfg.minhash)
    out = verify_pairs_exact(
        edges, ds, k=cfg.shingle.k, threshold=0.5
    ).to_pandas()
    assert len(out) > 0
    # spot-check 10 pairs against direct computation
    urls = pages_small.pages["url"].to_pylist()
    texts = pages_small.pages["text"].to_pylist()
    node_to_text = dict(zip(node_ids(urls).tolist(), texts))
    # NB: iterrows() would upcast uint64 ids to float64 and corrupt them
    h = out.head(10)
    for s, d, je in zip(
        h["src"].astype(np.uint64), h["dst"].astype(np.uint64), h["jaccard_exact"]
    ):
        j = exact_jaccard(node_to_text[int(s)], node_to_text[int(d)], k=cfg.shingle.k)
        assert abs(j - je) < 1e-9
        assert j >= 0.5


def test_all_pairs_candidates_and_raw_id_verify():
    """all_pairs_candidates emits exactly the (src < dst) triangle; the
    raw_ids verify path scores it identically to per-pair brute force."""
    import itertools

    from dupers_ray.stages.ngram import all_pairs_candidates

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        "one two three four five six seven eight nine",
        "totally different words in this tiny document here",
        "alpha beta gamma delta epsilon zeta eta theta",   # exact dup of 0
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(3)

    pairs = all_pairs_candidates(ds, id_col="doc_id").to_pandas()
    got = set(zip(pairs["src"], pairs["dst"]))
    assert got == set(itertools.combinations(range(5), 2))

    out = verify_pairs_exact(
        all_pairs_candidates(ds, id_col="doc_id"), ds,
        id_col="doc_id", k=5, threshold=0.2, raw_ids=True,
    ).to_pandas()
    by_pair = {(int(r.src), int(r.dst)): r.jaccard_exact
               for r in out.itertuples()}
    for (a, b) in itertools.combinations(range(5), 2):
        j = exact_jaccard(texts[a], texts[b], k=5)
        if j >= 0.2:
            assert abs(by_pair[(a, b)] - j) < 1e-12, (a, b)
        else:
            assert (a, b) not in by_pair
    assert by_pair[(0, 4)] == 1.0

    # id_cap restricts BOTH sides of the triangle
    capped = all_pairs_candidates(ds, id_col="doc_id", id_cap=3).to_pandas()
    assert set(zip(capped["src"], capped["dst"])) == set(
        itertools.combinations(range(3), 2)
    )


def test_containment_asymmetry_and_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.ngram import (
        all_pairs_candidates,
        exact_containment,
        shingle_set,
        verify_containment_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                                   # 0: contained in 1
        base + " extra words to wrap the quote around the original text",
        "completely different content here with many unrelated tokens now",
        base,                                   # 3: exact dup of 0
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    pairs = all_pairs_candidates(ds, id_col="doc_id")
    out = verify_containment_pairs(
        pairs, ds, id_col="doc_id", threshold=0.5
    ).to_pandas().set_index(["src_id", "dst_id"])
    # 0 fully contained in 1, but 1 not in 0 (asymmetric)
    assert out.loc[(0, 1), "c_src"] == 1.0
    assert out.loc[(0, 1), "c_dst"] < 1.0
    assert out.loc[(0, 3), "c_src"] == 1.0 and out.loc[(0, 3), "c_dst"] == 1.0
    assert (2, 0) not in out.index and (0, 2) not in out.index
    # engine matches the scalar reference on every surviving pair
    for (s, d), row in out.iterrows():
        cs, cd = exact_containment(texts[s], texts[d])
        assert abs(row["c_src"] - cs) < 1e-12
        assert abs(row["c_dst"] - cd) < 1e-12
    # sanity: shingle_set contract (short text -> single whole shingle)
    assert shingle_set("one two", 5) == {("one", "two")}
