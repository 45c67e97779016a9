from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from dupers_ray.functions.hashing import hash_str_u64, splitmix64
from dupers_ray.stages.minhash import _POLY
from dupers_ray.stages.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    winnow_fingerprints,
)


def _ref_grams(text: str, k: int) -> list[int]:
    """Per-doc reference gram hashes: md5-u64 tokens, rolling _POLY fold,
    splitmix64 — the slow per-doc restatement of _gram_hashes."""
    toks = re.findall(r"[a-z0-9_]+", text.lower())
    if len(toks) < k:
        return []
    th = hash_str_u64(toks)
    out = []
    with np.errstate(over="ignore"):
        for i in range(len(toks) - k + 1):
            acc = th[i]
            for j in range(1, k):
                acc = acc * _POLY + th[i + j]
            out.append(int(splitmix64(np.array([acc], np.uint64))[0]))
    return out


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: rightmost min per window, distinct (pos, gram);
    whole-segment window when the doc has fewer than w grams."""
    gh = _ref_grams(text, k)
    m = len(gh)
    sel: set[tuple[int, int]] = set()
    if m == 0:
        return sel
    if m < w:
        windows = [(0, m)]
    else:
        windows = [(s, s + w) for s in range(m - w + 1)]
    for lo, hi in windows:
        win = gh[lo:hi]
        mn = min(win)
        p = hi - 1 - win[::-1].index(mn)  # rightmost occurrence
        sel.add((p + 1, gh[p]))  # 1-based pos
    return sel


def _run(texts: list[str], **kw) -> dict[int, set[tuple[int, int]]]:
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = winnow_fingerprints(t, **kw)
    got: dict[int, set[tuple[int, int]]] = {i: set() for i in range(len(texts))}
    for d, p, g in zip(
        out.column("doc_id").to_pylist(),
        out.column("pos").to_pylist(),
        out.column("gram").to_pylist(),
    ):
        got[d].add((p, g))
    return got


def test_matches_reference_implementation():
    rng = np.random.default_rng(7)
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 60))
        # small vocab forces repeated grams and min-ties
        texts.append(" ".join(f"w{int(x)}" for x in rng.integers(0, 8, n)))
    texts += ["", "one two three", "a b c d e", "x " * 200]
    got = _run(texts)
    for i, text in enumerate(texts):
        assert got[i] == _ref_winnow(text, DEFAULT_K, DEFAULT_W), f"doc {i}"


def test_short_doc_edges():
    # < k tokens: no grams, no fingerprints
    got = _run(["one two three four"])
    assert got[0] == set()
    # exactly k tokens: one gram -> exactly one fingerprint at pos 1
    got = _run(["one two three four five"])
    assert len(got[0]) == 1 and next(iter(got[0]))[0] == 1
    # k..k+w-2 tokens (< w grams): exactly one fingerprint
    got = _run(["one two three four five six seven"])
    assert len(got[0]) == 1


def test_guarantee_shared_run_shares_fingerprint():
    """Schleimer et al. §3: a common token run of length >= w + k - 1
    yields at least one common selected gram VALUE."""
    rng = np.random.default_rng(11)
    shared = " ".join(f"s{int(x)}" for x in rng.integers(0, 1000, DEFAULT_W + DEFAULT_K - 1))
    a = " ".join(f"a{int(x)}" for x in rng.integers(0, 1000, 50))
    b = " ".join(f"b{int(x)}" for x in rng.integers(0, 1000, 50))
    got = _run([a + " " + shared + " " + b, b + " " + shared + " " + a])
    grams0 = {g for _, g in got[0]}
    grams1 = {g for _, g in got[1]}
    assert grams0 & grams1


def test_winnow_matches_brute_force():
    import ray.data as rd

    from dupers_ray.stages.winnow import winnow_matches

    rng = np.random.default_rng(5)
    texts = []
    base = " ".join(f"c{int(x)}" for x in rng.integers(0, 1000, 60))
    for i in range(12):
        noise = " ".join(f"n{i}_{int(x)}" for x in rng.integers(0, 1000, 30))
        # half the docs embed the shared passage -> guaranteed shared grams
        texts.append((base + " " + noise) if i % 2 == 0 else noise)
    # brute-force expectation from the per-doc reference winnowing
    fps = [
        {g for _, g in _ref_winnow(t, DEFAULT_K, DEFAULT_W)} for t in texts
    ]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            n = len(fps[i] & fps[j])
            if n >= 2:
                want[(i, j)] = n
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ).repartition(3)
    got = {
        (r["src_id"], r["dst_id"]): r["n_shared"]
        for r in winnow_matches(ds, min_shared=2).take_all()
    }
    assert got == want
    assert want  # the planted shared passage must actually pair up


def test_density_and_batching_invariance():
    rng = np.random.default_rng(3)
    text = " ".join(f"t{int(x)}" for x in rng.integers(0, 5000, 400))
    got = _run([text])[0]
    n_grams = 400 - DEFAULT_K + 1
    # expected density ~ 2/(w+1); allow generous slack either side
    assert 0.2 * n_grams / DEFAULT_W <= len(got) <= 0.9 * n_grams
    # splitting the batch must not change per-doc output
    one = _run([text, "other words entirely here now and then some"])
    t1 = pa.table({"doc_id": [0], "text": [text]})
    solo = winnow_fingerprints(t1)
    solo_set = {
        (p, g)
        for p, g in zip(solo.column("pos").to_pylist(), solo.column("gram").to_pylist())
    }
    assert one[0] == solo_set


def test_segment_pairs_matches_bruteforce():
    from dupers_ray.functions.pairs import segment_pairs

    rng = np.random.default_rng(11)
    for trial in range(20):
        key = np.sort(rng.integers(0, 12, rng.integers(0, 60)).astype(np.int64))
        cap = int(rng.integers(1, 9))
        ii, jj, over, mx = segment_pairs(key, max_bucket=cap)
        want = set()
        n_over = 0
        seg_max = 0
        s = 0
        while s < len(key):
            e = s
            while e < len(key) and key[e] == key[s]:
                e += 1
            seg_max = max(seg_max, e - s)
            if e - s > cap:
                n_over += 1
            for a in range(s, min(e, s + cap)):
                for b in range(a + 1, min(e, s + cap)):
                    want.add((a, b))
            s = e
        assert set(zip(ii.tolist(), jj.tolist())) == want
        assert len(ii) == len(want)
        assert over == n_over
        assert mx == (seg_max if len(key) else 0)
    # empty input
    ii, jj, over, mx = segment_pairs(np.empty(0, np.int64), max_bucket=4)
    assert len(ii) == 0 and len(jj) == 0 and over == 0 and mx == 0
