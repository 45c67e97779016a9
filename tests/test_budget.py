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


def test_mix_budget_per_source_independence():
    """Each source's prefix is independent: permuting blocks or raising
    one source's budget never changes another source's selections;
    unknown sources get budget 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.budget import select_mix_budget

    rng = np.random.default_rng(3)
    n = 120
    t = pa.table({
        "doc_id": list(range(n)),
        "text": [" ".join(f"w{j}" for j in range(int(rng.integers(1, 9))))
                 for _ in range(n)],
        "source": [f"s{i % 3}" for i in range(n)],
    })
    ds = rd.from_arrow(t).repartition(5)

    def run(budgets):
        out = select_mix_budget(ds, budgets=budgets)
        return {r["doc_id"]: (r["source"], r["n_tokens"], r["cum_tokens"],
                              r["selected"]) for r in out.take_all()}

    a = run({"s0": 30, "s1": 50})
    assert len(a) == n  # no row dropped
    # unknown source s2 -> budget 0, nothing selected
    assert all(v[3] == 0 for v in a.values() if v[0] == "s2")
    # brute per-source check
    from dupers_ray.functions.hashing import splitmix64

    for src, budget in [("s0", 30), ("s1", 50)]:
        rows = [(d, v[1]) for d, v in a.items() if v[0] == src]
        keys = splitmix64(np.array([d for d, _ in rows], np.uint64))
        order = np.lexsort((np.array([d for d, _ in rows]), keys))
        cum = np.cumsum(np.array([nt for _, nt in rows])[order])
        want_sel = {rows[i][0]: int(c <= budget)
                    for i, c in zip(order, cum)}
        got_sel = {d: v[3] for d, v in a.items() if v[0] == src}
        assert got_sel == want_sel

    # raising s1's budget leaves s0 selections identical
    b = run({"s0": 30, "s1": 500})
    assert {d: v for d, v in a.items() if v[0] == "s0"} == \
           {d: v for d, v in b.items() if v[0] == "s0"}
    # parallelism invariance
    out2 = select_mix_budget(rd.from_arrow(t).repartition(17),
                             budgets={"s0": 30, "s1": 50})
    c = {r["doc_id"]: r["selected"] for r in out2.take_all()}
    assert c == {d: v[3] for d, v in a.items()}


def _pack_reference(tbl: pa.Table, seq_len: int) -> pd.DataFrame:
    """Single-process packing layout: concat docs (+1 EOS) in id order."""
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    texts = tbl.column("text").to_pylist()
    n = np.array(
        [len(_TOKEN_RE.findall((s or "").lower())) for s in texts], np.int64
    )
    order = np.argsort(ids)
    eff = n[order] + 1
    start = np.zeros(len(ids), np.int64)
    start[order] = np.cumsum(eff) - eff
    return pd.DataFrame({
        "doc_id": ids, "n_tokens": n, "start_offset": start,
        "first_seq": start // seq_len, "last_seq": (start + n) // seq_len,
    }).sort_values("doc_id").reset_index(drop=True)


def test_pack_sequences_matches_reference(pages_small):
    from dupers_ray.stages.budget import pack_sequences

    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    want = _pack_reference(tbl, 128)
    got = _got(pack_sequences(rd.from_arrow(tbl), seq_len=128))
    pd.testing.assert_frame_equal(got[want.columns], want)
    # windows tile the stream: every sequence index up to the last is
    # covered by exactly the docs whose [first_seq, last_seq] spans it
    total = int((want.n_tokens + 1).sum())
    covered = np.zeros(total // 128 + 1, bool)
    for _, r in want.iterrows():
        covered[r.first_seq : r.last_seq + 1] = True
    assert covered.all()


def test_pack_sequences_layout_invariance_and_sparse_ids(pages_small):
    from dupers_ray.stages.budget import pack_sequences

    t = pages_small.pages
    # sparse, non-dense ids (stride 7 with a big base) exercise the
    # monotone-bucket mapping away from the dense happy path
    ids = 10_000 + 7 * np.arange(t.num_rows, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "text": t.column("text")})
    want = _pack_reference(tbl, 64)
    a = _got(pack_sequences(rd.from_arrow(tbl), seq_len=64))
    b = _got(
        pack_sequences(
            rd.from_arrow(tbl).repartition(31), seq_len=64, n_buckets=128
        )
    )
    pd.testing.assert_frame_equal(a[want.columns], want)
    pd.testing.assert_frame_equal(a, b)


def test_packed_windows_matches_reference(pages_small):
    """Materialized window checksums equal a single-process build of the
    concatenated (+EOS) token-id stream, across block layouts."""
    from dupers_ray.functions.hashing import hash_str_u64
    from dupers_ray.stages.budget import packed_windows

    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    L = 96
    # single-process reference stream
    stream: list[int] = []
    for i in np.argsort(np.asarray(tbl.column("doc_id"))):
        toks = _TOKEN_RE.findall((tbl.column("text")[int(i)].as_py() or "").lower())
        stream.extend(int(h) for h in hash_str_u64(toks))
        stream.append(0)  # EOS
    arr = np.array(stream, np.uint64)
    pos = np.arange(len(arr), dtype=np.int64)
    want = {}
    for w in range(int(pos[-1]) // L + 1):
        m = (pos // L) == w
        want[w] = (
            int(m.sum()),
            int((arr[m] * (pos[m] % L + 1).astype(np.uint64)).sum(
                dtype=np.uint64)),
        )

    for parts in (4, 23):
        ds = rd.from_arrow(tbl).repartition(parts)
        got = {
            r["seq_id"]: (r["n_toks"], int(r["checksum"]))
            for r in packed_windows(ds, seq_len=L).take_all()
        }
        assert got == want
    # every window full except possibly the last
    last = max(want)
    assert all(v[0] == L for w, v in want.items() if w != last)


def test_pack_sequences_full_range_hash_ids(pages_small):
    """Hash-derived ids spanning the whole int64 line (negative lo,
    positive hi): the bucket map must stay monotone without overflow —
    regression for the round-3 uint64-wraparound fix."""
    from dupers_ray.functions.hashing import splitmix64
    from dupers_ray.stages.budget import pack_sequences

    t = pages_small.pages
    ids = splitmix64(
        np.arange(t.num_rows, dtype=np.int64).view(np.uint64) + 99
    ).view(np.int64)
    assert ids.min() < 0 < ids.max()
    tbl = pa.table({"doc_id": pa.array(ids), "text": t.column("text")})
    want = _pack_reference(tbl, 128)
    a = _got(pack_sequences(rd.from_arrow(tbl), seq_len=128))
    b = _got(
        pack_sequences(
            rd.from_arrow(tbl).repartition(13), seq_len=128, n_buckets=64
        )
    )
    pd.testing.assert_frame_equal(a[want.columns], want)
    pd.testing.assert_frame_equal(a, b)


def test_chunk_docs_matches_bruteforce(pages_small):
    from dupers_ray.stages.budget import chunk_docs

    t = pages_small.pages
    tbl = pa.table({
        "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        "text": t.column("text"),
    })
    L, S = 24, 10
    want = []
    for i in range(t.num_rows):
        toks = _TOKEN_RE.findall((tbl.column("text")[i].as_py() or "").lower())
        starts = list(range(0, max(len(toks), 1), S)) or [0]
        for c, s in enumerate(starts):
            w = toks[s: s + L]
            want.append((i, c, s, len(w), " ".join(w)))
    want.sort()
    for parts in (2, 17):
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["start_tok"],
             r["n_chunk_tokens"], r["chunk_text"])
            for r in chunk_docs(
                rd.from_arrow(tbl).repartition(parts), chunk_len=L, stride=S
            ).take_all()
        )
        assert got == want
    # disjoint default stride: chunks tile each doc exactly
    got2 = chunk_docs(rd.from_arrow(tbl), chunk_len=L).take_all()
    per_doc: dict[int, int] = {}
    for r in got2:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_chunk_tokens"]
    for i in range(t.num_rows):
        toks = _TOKEN_RE.findall((tbl.column("text")[i].as_py() or "").lower())
        assert per_doc[i] == len(toks)


# ---------------------------------------------------------------------------
# Temperature-weighted source mixing (temperature_sample)
# ---------------------------------------------------------------------------


def _skewed_corpus() -> pa.Table:
    """3 sources with 400 / 100 / 25 docs — a 16:4:1 skew that alpha=0.5
    compresses to 4:2:1 in sqrt-space."""
    sizes = {"big": 400, "mid": 100, "small": 25}
    ids, src = [], []
    i = 0
    for s, k in sizes.items():
        for _ in range(k):
            ids.append(i)
            src.append(s)
            i += 1
    return pa.table({"doc_id": ids, "source": src})


def _brute_temperature(tbl: pa.Table, target: int, denom: int = 1_000_000):
    ids = np.asarray(tbl.column("doc_id"), dtype=np.uint64)
    src = tbl.column("source").to_pylist()
    from collections import Counter

    cnt = Counter(src)
    w = {s: int(np.floor(np.sqrt(float(n)))) for s, n in cnt.items()}
    S = sum(w.values())
    r = {
        s: min(denom, target * w[s] * denom // (S * cnt[s]))
        for s in cnt
    }
    h = splitmix64(ids) % np.uint64(denom)
    keep = [int(hh) < r[s] for hh, s in zip(h, src)]
    return {
        (int(i), s) for i, s, k in zip(ids, src, keep) if k
    }


def test_temperature_sample_matches_brute():
    from dupers_ray.stages.budget import temperature_sample

    tbl = _skewed_corpus()
    got = temperature_sample(
        rd.from_arrow(tbl).repartition(5), target_rows=200
    ).to_pandas()
    assert set(zip(got["doc_id"], got["source"])) == _brute_temperature(
        tbl, 200
    )


def test_temperature_sample_upweights_small_sources():
    """Kept fraction of the small source exceeds the big source's (the
    whole point of alpha<1), and totals land near the target."""
    from dupers_ray.stages.budget import temperature_sample

    got = temperature_sample(
        rd.from_arrow(_skewed_corpus()), target_rows=200
    ).to_pandas()
    frac = got.groupby("source").size()
    assert frac.get("small", 0) / 25 > frac.get("big", 0) / 400
    assert 140 <= len(got) <= 260  # Bernoulli noise band around 200


def test_temperature_sample_rate_caps_at_one():
    """target >> corpus: every row keeps (rate caps at denom)."""
    from dupers_ray.stages.budget import temperature_sample

    tbl = _skewed_corpus()
    got = temperature_sample(
        rd.from_arrow(tbl), target_rows=10_000_000
    ).to_pandas()
    assert len(got) == tbl.num_rows


def test_temperature_sample_block_layout_invariant():
    from dupers_ray.stages.budget import temperature_sample

    tbl = _skewed_corpus()
    a = temperature_sample(rd.from_arrow(tbl), target_rows=123).to_pandas()
    b = temperature_sample(
        rd.from_arrow(tbl).repartition(11), target_rows=123
    ).to_pandas()
    key = lambda df: sorted(zip(df["doc_id"], df["source"]))  # noqa: E731
    assert key(a) == key(b)
