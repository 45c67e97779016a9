"""Bigram-LM rarity: kernel vs a per-doc brute-force Python reference,
broadcast ≡ join path equality, and CCNet tercile bucket properties."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.stages.lmscore import (
    RARITY_SCALE,
    bigram_counts,
    bigram_rarity,
    rarity_buckets,
)

DOCS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog ran",
    "completely unrelated words here",
    "the cat sat on the mat",   # exact dup of doc 0
    "x",                        # one token -> 0 bigrams
    "",                         # empty -> 0 bigrams
]


def _tok(s: str) -> list[str]:
    return re.findall(r"[a-z0-9_]+", s.lower())


def _bigrams(s: str) -> list[tuple[str, str]]:
    t = _tok(s)
    return list(zip(t, t[1:]))


def ref_scores() -> list[tuple[int, int]]:
    """Independent reference on STRING bigrams (no hashing): the engine's
    hashed counts must agree unless md5-u64+fold collides (it doesn't on
    this corpus)."""
    corpus = Counter(b for d in DOCS for b in _bigrams(d))
    out = []
    for d in DOCS:
        bs = _bigrams(d)
        out.append((len(bs), sum(RARITY_SCALE // (corpus[b] + 1) for b in bs)))
    return out


@pytest.fixture(scope="module")
def ds():
    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(DOCS))),
        "text": DOCS,
    })).repartition(3)


def test_counts_match_string_reference(ds):
    got = bigram_counts(ds).to_pandas()
    corpus = Counter(b for d in DOCS for b in _bigrams(d))
    assert sorted(got["n"]) == sorted(corpus.values())
    assert int(got["n"].sum()) == sum(corpus.values())


def test_rarity_matches_reference_both_paths(ds):
    exp = ref_scores()
    for strategy in ("broadcast", "join"):
        got = (
            bigram_rarity(ds, strategy=strategy)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(got["n_bigrams"]) == [e[0] for e in exp], strategy
        assert list(got["rarity"]) == [e[1] for e in exp], strategy
    # exact dup docs score identically
    r = {d: (nb, ra) for d, nb, ra in got.itertuples(index=False)}
    assert r[0] == r[4]
    # degenerate docs: zero bigrams, zero rarity
    assert r[5] == (0, 0) and r[6] == (0, 0)
    # rare text scores strictly higher per bigram than repeated text
    assert r[3][1] / r[3][0] > r[0][1] / r[0][0]


def test_buckets_tercile_ranks(ds):
    got = rarity_buckets(ds).to_pandas().sort_values("doc_id")
    n = len(got)
    avg = got.set_index(got["doc_id"])["avg_rarity"]
    # cuts re-derived independently: smallest avg with rank >= ceil(k*n/3)
    vals = sorted(avg)
    q1 = vals[(n + 2) // 3 - 1]
    q2 = vals[(2 * n + 2) // 3 - 1]
    for _, row in got.iterrows():
        exp = ("head" if row["avg_rarity"] <= q1
               else "middle" if row["avg_rarity"] <= q2 else "tail")
        assert row["bucket"] == exp
    # ordering semantics: the unrelated-words doc is in the worst bucket
    # present, the duplicated familiar docs in the best
    assert got.set_index("doc_id")["bucket"][3] == "tail"
    assert got.set_index("doc_id")["bucket"][0] == "head"


def test_hash_chain_pins_oracle_parity():
    """The engine bigram hash equals md5-u64(w1)*P + md5-u64(w2) followed
    by splitmix64 — the exact chain the SQL oracle restates."""
    import numpy as np

    from dupers_ray.functions.hashing import splitmix64
    from dupers_ray.stages.lmscore import _doc_bigrams
    from dupers_ray.stages.minhash import _POLY

    col = pa.chunked_array([pa.array(["alpha beta"])])
    bh, bdoc, nb = _doc_bigrams(col, np.array([7]))
    h = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in ("alpha", "beta")]
    raw = np.uint64((h[0] * int(_POLY) + h[1]) % (1 << 64))
    assert list(bh) == [splitmix64(np.array([raw], np.uint64))[0]]
    assert list(nb) == [1] and list(bdoc) == [0]
