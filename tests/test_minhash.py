"""MinHash signature unit tests: determinism, Jaccard estimation accuracy,
shingle semantics, band explode shape."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from dupers_ray.config import MinHashConfig, ShingleConfig
from dupers_ray.stages.minhash import MinHasher, explode_bands, signature_jaccard


def _mk(num_perm=128, bands=32, rows=4, k=3):
    return MinHasher(
        shingle=ShingleConfig(k=k),
        minhash=MinHashConfig(num_perm=num_perm, bands=bands, rows=rows),
    )


def test_signature_deterministic():
    mh1, mh2 = _mk(), _mk()
    texts = ["the quick brown fox jumps over the lazy dog " * 5]
    s1, n1 = mh1.signatures(texts)
    s2, n2 = mh2.signatures(texts)
    assert (s1 == s2).all() and (n1 == n2).all()


def test_identical_texts_identical_sigs():
    mh = _mk()
    s, _ = mh.signatures(["a b c d e f g h"] * 3)
    assert (s[0] == s[1]).all() and (s[0] == s[2]).all()


import pytest


@pytest.mark.parametrize("method,tol", [("universal", 0.12), ("oph", 0.16)])
def test_jaccard_estimate_tracks_truth(method, tol):
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(500)]
    base = list(rng.choice(words, 300))
    # 10% token edits
    edited = list(base)
    for p in rng.choice(len(edited), 30, replace=False):
        edited[p] = f"x{p}"
    mh = MinHasher(
        shingle=ShingleConfig(k=3),
        minhash=MinHashConfig(num_perm=256, bands=64, rows=4, method=method),
    )
    s, _ = mh.signatures([" ".join(base), " ".join(edited)])
    est = signature_jaccard(s[0], s[1])

    # true shingle jaccard
    def sh(toks, k=3):
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    a, b = sh(base), sh(edited)
    true_j = len(a & b) / len(a | b)
    # universal: s.e. ~ sqrt(j(1-j)/256) ~ 0.03; OPH adds densification
    # variance when shingles (~300) barely cover 256 bins
    assert abs(est - true_j) < tol


def test_disjoint_texts_low_jaccard():
    mh = _mk()
    s, _ = mh.signatures(["aa bb cc dd ee ff gg hh", "ii jj kk ll mm nn oo pp"])
    assert signature_jaccard(s[0], s[1]) < 0.1


def test_short_and_empty_docs():
    mh = _mk(k=5)
    s, n = mh.signatures(["one two", "", "   ", "single"])
    # "one two" → 1 shingle (whole doc), "" and "   " → none, "single" → 1
    assert list(n) == [1, 0, 0, 1]
    assert s.shape == (2, 128)


def test_call_emits_rows_only_for_content():
    mh = _mk()
    t = pa.table({"url": ["u1", "u2", "u3"], "text": ["a b c d", "", "x y z w"]})
    out = mh(t)
    assert out.column("url").to_pylist() == ["u1", "u3"]
    assert out.column("node").type == pa.uint64()
    assert len(out.column("sig")[0].as_py()) == 128 * 4  # binary: uint32 LE each


def test_explode_bands_shape_and_salt():
    mh = _mk(num_perm=8, bands=4, rows=2)
    t = pa.table({"url": ["u1", "u2"], "text": ["a b c d e", "a b c d e"]})
    sig_t = mh(t)
    out = explode_bands(sig_t, bands=4, rows=2)
    assert len(out) == 8  # 2 docs × 4 bands
    assert out.column("band_id").to_pylist() == [0, 1, 2, 3, 0, 1, 2, 3]
    # identical docs → identical band hashes per band
    bh = out.column("band_hash").to_pylist()
    assert bh[:4] == bh[4:]
    # different bands of same doc get different hashes (salted) — overwhelmingly
    assert len(set(bh[:4])) > 1


def test_explode_bands_empty():
    mh = _mk()
    empty = mh(pa.table({"url": pa.array([], pa.string()), "text": pa.array([], pa.string())}))
    out = explode_bands(empty, bands=32, rows=4)
    assert len(out) == 0
    assert out.column_names == ["band_id", "band_hash", "url", "node"]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=0, max_size=80,
        ),
        min_size=1, max_size=10,
    )
)
def test_minhash_fuzz_deterministic_no_crash(texts):
    """Property: arbitrary unicode inputs never crash the signature kernel
    and always reproduce bit-identically (FuzzChecksum-style,
    /root/reference/pkg/dupe/parse/parse_fuzz.go:38-92)."""
    mh = MinHasher(
        shingle=ShingleConfig(k=3),
        minhash=MinHashConfig(num_perm=32, bands=8, rows=4),
    )
    s1, n1 = mh.signatures(texts)
    s2, n2 = mh.signatures(texts)
    assert (n1 == n2).all()
    assert s1.shape == s2.shape and (s1 == s2).all()
    assert s1.shape[0] == int((n1 > 0).sum())


def test_binary_matrix_zero_copy_and_fallback():
    """binary_matrix views uniform-width binary columns without copying
    (including sliced/chunked inputs) and falls back on ragged data."""
    import numpy as np
    import pyarrow as pa

    from dupers_ray.functions.arrowview import binary_matrix

    rng = np.random.default_rng(5)
    m = rng.integers(0, 2**16, (300, 64)).astype("<u4")
    col = pa.array([m[i].tobytes() for i in range(300)], pa.binary())
    v = binary_matrix(col, "<u4")
    assert (v == m).all() and v.base is not None

    chunked = pa.chunked_array([col.slice(0, 100), col.slice(100)])
    assert (binary_matrix(chunked, "<u4") == m).all()
    assert (binary_matrix(col.slice(50, 70), "<u4") == m[50:120]).all()

    empty = pa.array([], pa.binary())
    assert binary_matrix(empty, "<u4").shape == (0, 0)

    with_null = pa.array([m[0].tobytes(), None, m[2].tobytes()], pa.binary())
    out = binary_matrix(with_null.drop_null(), "<u4")
    assert (out == m[[0, 2]]).all()


def test_plan_lsh_properties():
    import numpy as np

    from dupers_ray.stages.minhash import plan_lsh

    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        for n in (64, 128, 256):
            b, r = plan_lsh(t, n)
            assert b * r == n and b >= 1 and r >= 1
            # the S-curve's 50% point sits near the threshold: within the
            # gap to the neighbouring factorizations by construction
            mid = (1 - (1 - t**r) ** b)
            assert 0.02 < mid < 0.98
    # higher threshold -> more rows per band (sharper AND)
    assert plan_lsh(0.9, 128)[1] >= plan_lsh(0.5, 128)[1]
    # recall-weighted planning never picks MORE rows (never less recall)
    b0, r0 = plan_lsh(0.8, 128)
    b1, r1 = plan_lsh(0.8, 128, fn_weight=10.0)
    assert r1 <= r0
    # recall at the threshold is higher under fn weighting
    p0 = 1 - (1 - 0.8**r0) ** b0
    p1 = 1 - (1 - 0.8**r1) ** b1
    assert p1 >= p0
    # degenerate budgets still valid
    assert plan_lsh(0.5, 1) == (1, 1)


def test_sig_store_u2_superset_and_verify_parity():
    """"u2" stores uint16 folds: band candidates are a SUPERSET of the
    u4 candidates (full equality implies fold equality) and the fold16
    verify gate is bit-identical, so u4 clusters' merged pairs survive
    in u2 and typical corpora produce identical assignments."""
    import ray.data as rd

    from dupers_ray.config import DedupConfig, MinHashConfig
    from dupers_ray.pipelines.dupe import dupe_clusters

    texts = []
    for i in range(40):
        base = " ".join(f"tok{i}w{j}" for j in range(30))
        texts.append(base)
        texts.append(base + " tail")  # near-dup partner
    tbl = {"url": [f"u{i}" for i in range(len(texts))], "text": texts}
    ds = rd.from_items(
        [{"url": u, "text": t} for u, t in zip(tbl["url"], tbl["text"])]
    )
    out = {}
    for store in ("u4", "u2"):
        cfg = DedupConfig(minhash=MinHashConfig(sig_store=store))
        df = dupe_clusters(ds, cfg).to_pandas().sort_values("url")
        out[store] = dict(zip(df["url"], df["cluster_id"]))
    assert out["u4"] == out["u2"]
    # every u4-merged pair (same cluster) stays merged under u2
    from collections import defaultdict
    groups4 = defaultdict(set)
    for u, c in out["u4"].items():
        groups4[c].add(u)
    groups2 = defaultdict(set)
    for u, c in out["u2"].items():
        groups2[c].add(u)
    for members in groups4.values():
        anyu = next(iter(members))
        assert members <= groups2[out["u2"][anyu]]


def test_pack_sig_and_matrix_roundtrip():
    import numpy as np
    import pyarrow as pa

    from dupers_ray.stages.minhash import fold16_matrix, pack_sig, sig_matrix

    sig = np.arange(12, dtype=np.uint32).reshape(2, 6) * 70001
    for store, width in (("u4", 4), ("u2", 2)):
        packed = pack_sig(sig, store)
        col = pa.array([packed[i].tobytes() for i in range(2)], pa.binary())
        m = sig_matrix(col, 6)
        assert m.shape == (2, 6) and m.dtype.itemsize == width
        f = fold16_matrix(col, 6)
        assert f.dtype == np.uint16
        assert (f == (sig & 0xFFFF).astype(np.uint16)).all()
