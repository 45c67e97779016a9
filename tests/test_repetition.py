"""repetition_stats unit semantics + dup_ngram_coverage vs brute force."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dupers_ray.stages.ngram import shingle_set
from dupers_ray.stages.repetition import dup_ngram_coverage, repetition_stats


def test_repetition_stats_cases():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "a b a b a",      # tokens: a x3, b x2; bigrams ab,ba,ab,ba
                "unique words only here",
                "",
                None,
            ],
        }
    )
    out = repetition_stats(t).to_pydict()
    assert out["n_tokens"] == [5, 4, 0, 0]
    assert out["n_distinct_tokens"] == [2, 4, 0, 0]
    assert out["top_token_n"] == [3, 1, 0, 0]
    assert out["n_bigrams"] == [4, 3, 0, 0]
    assert out["n_distinct_bigrams"] == [2, 3, 0, 0]
    assert out["top_bigram_n"] == [2, 1, 0, 0]


def test_dup_ngram_coverage_planted():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    shared = " ".join(vocab[i] for i in rng.permutation(200)[:12])
    docs = []
    for i in range(30):
        own = " ".join(rng.choice(vocab, 25))
        # docs 0..9 embed the same 12-token passage -> shared 8-grams
        docs.append((i, f"{own} {shared}" if i < 10 else own))
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": [d[1] for d in docs],
        }
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in dup_ngram_coverage(
            rd.from_arrow(t).repartition(4), id_col="doc_id", k=8
        ).take_all()
    }
    # brute force on shingle_set (the same semantics the stage hashes)
    sets = {i: {" ".join(g) for g in shingle_set(txt, 8)} for i, txt in docs}
    for i, s in sets.items():
        n_dup = sum(
            1 for g in s if any(g in o for j, o in sets.items() if j != i)
        )
        assert got[i] == (len(s), n_dup), f"doc {i}"
    assert any(v[1] > 0 for v in got.values())  # planted dups detected
