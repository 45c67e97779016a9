"""Bit-parallel Myers edit distance (stages/editdist.py) vs a classic
DP reference, plus the pair-verification pipeline."""
from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.editdist import (
    edit_verified_pairs,
    myers_prefix_distance,
)


def _dp(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_myers_matches_dp_random():
    rng = random.Random(42)
    alpha = "abcde "
    pairs = []
    for _ in range(300):
        la, lb = rng.randrange(0, 64), rng.randrange(0, 64)
        pairs.append((
            "".join(rng.choice(alpha) for _ in range(la)),
            "".join(rng.choice(alpha) for _ in range(lb)),
        ))
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    got = myers_prefix_distance(a_list, b_list)
    exp = np.array([_dp(a, b) for a, b in pairs])
    assert (got == exp).all()


def test_myers_edge_cases():
    a = ["", "abc", "", "x" * 64, "abc"]
    b = ["", "", "xyz", "x" * 64, "abc"]
    got = myers_prefix_distance(a, b)
    assert got.tolist() == [0, 3, 3, 0, 0]


def test_myers_prefix_cap():
    # strings longer than the cap are truncated before comparison
    a = ["abcdef" * 20]
    b = [("abcdef" * 10) + "zzz" + "abcdef"]
    got = myers_prefix_distance(a, b, m_cap=64)
    assert got[0] == _dp(("abcdef" * 20)[:64], (("abcdef" * 10) + "zzz" + "abcdef")[:64])


def test_myers_unicode_alphabet():
    a = ["héllo wörld", "καλημέρα"]
    b = ["hello world", "καλησπέρα"]
    got = myers_prefix_distance(a, b)
    assert got.tolist() == [_dp(*p) for p in zip(a, b)]


def test_edit_verified_pairs_pipeline():
    # long docs so one changed token stays within simhash hamming<=3
    base = " ".join(
        "the quick brown fox jumps over the lazy dog while seventy "
        "volunteers measure corpus duplication rates across many pages"
        for _ in range(5)
    )
    variant = base.replace("quick", "quark", 1)
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, variant, "unrelated gardening text"], pa.string()),
    })
    out = edit_verified_pairs(rd.from_arrow(tbl)).to_pandas()
    # docs 0/1 are a simhash pair; their 64-char prefixes differ by the
    # 'quick' -> 'quark' substitution (2 chars)
    assert len(out) == 1
    assert int(out.loc[0, "edit_dist"]) == _dp(base[:64], variant[:64])
    assert int(out.loc[0, "edit_dist"]) == 2


def test_edit_verified_pairs_empty_pair_set():
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(
            ["alpha beta gamma delta", "totally different words here"],
            pa.string(),
        ),
    })
    out = edit_verified_pairs(rd.from_arrow(tbl)).to_pandas()
    # (Ray drops zero-row blocks, so no column assertion — the guard's
    # job is that the join chain doesn't raise on an empty pair set)
    assert len(out) == 0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.tuples(st.text("abcX ", max_size=64), st.text("abcX ", max_size=64)),
            min_size=1, max_size=8,
        )
    )
    def test_myers_property_matches_dp(pairs):
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        got = myers_prefix_distance(a, b)
        exp = [_dp(x, y) for x, y in pairs]
        assert got.tolist() == exp
except ImportError:  # pragma: no cover
    pass


def test_cluster_edit_profile_pipeline():
    from dupers_ray.stages.editdist import cluster_edit_profile

    base = " ".join(
        "the quick brown fox jumps over the lazy dog while seventy "
        "volunteers measure corpus duplication rates across pages"
        for _ in range(5)
    )
    variant = base.replace("quick", "quark", 1)
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, variant, "unrelated gardening text"], pa.string()),
    })
    out = (
        cluster_edit_profile(rd.from_arrow(tbl))
        .to_pandas().sort_values("member_id").reset_index(drop=True)
    )
    # docs 0/1 cluster together; one is the anchor, the other the member
    assert len(out) == 1
    pair = {int(out.loc[0, "anchor_id"]), int(out.loc[0, "member_id"])}
    assert pair == {0, 1}
    assert int(out.loc[0, "edit_dist"]) == _dp(base[:64], variant[:64])


def test_cluster_edit_profile_no_clusters():
    from dupers_ray.stages.editdist import cluster_edit_profile

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(
            ["alpha beta gamma delta epsilon", "zeta eta theta iota kappa"],
            pa.string(),
        ),
    })
    out = cluster_edit_profile(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 0
