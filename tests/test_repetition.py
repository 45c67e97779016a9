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


# ---------------------------------------------------------------------------
# Arrival-order content novelty (content_novelty)
# ---------------------------------------------------------------------------


def test_content_novelty_brute():
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.ngram import shingle_set
    from dupers_ray.stages.repetition import content_novelty

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        # doc 1 repeats doc 0's opening 8-gram then diverges
        "alpha beta gamma delta epsilon zeta eta theta something else here",
        "a totally different page about rain gauges and barley fields",
        "short",          # <8 tokens -> single whole-text shingle
        "short",          # duplicate whole-text shingle -> 0 novel
        "",               # shingle-less -> absent from output
    ]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = (
        content_novelty(rd.from_arrow(tbl).repartition(3), k=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # brute force with the same shingle contract
    sets = [
        {"\x1f".join(t) for t in shingle_set(s, 8)} for s in texts
    ]
    exp = []
    for i, gs in enumerate(sets):
        if not gs:
            continue
        earlier = set().union(*sets[:i]) if i else set()
        exp.append({
            "doc_id": i,
            "n_grams": len(gs),
            "n_novel": len(gs - earlier),
        })
    assert got.to_dict("records") == exp
    # spot invariants
    assert got.loc[got["doc_id"] == 4, "n_novel"].item() == 0
    assert 5 not in set(got["doc_id"])


def test_novelty_by_source_rollup():
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.repetition import content_novelty, novelty_by_key

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota",
        "alpha beta gamma delta epsilon zeta eta theta other tail",
        "unrelated words about harbors and sailboats in fog",
        "",
    ]
    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": texts,
        "source": ["a", "b", "b", "a"],
    })
    got = (
        novelty_by_key(rd.from_arrow(tbl).repartition(2), k=8)
        .to_pandas().set_index("source")
    )
    nov = content_novelty(
        rd.from_arrow(tbl), k=8
    ).to_pandas().set_index("doc_id")
    # doc 3 is shingle-less -> absent; source 'a' counts doc 0 only
    assert got.loc["a", "n_docs"] == 1
    assert got.loc["b", "n_docs"] == 2
    for src, ids in {"a": [0], "b": [1, 2]}.items():
        assert got.loc[src, "sum_grams"] == nov.loc[ids, "n_grams"].sum()
        assert got.loc[src, "sum_novel"] == nov.loc[ids, "n_novel"].sum()


def test_content_novelty_sampled():
    """VERDICT r3 #4: hash-Bernoulli gram sampling. ppm=10^6 must equal
    exact EXACTLY (the mask is all-true); at ppm<<10^6 the corpus-level
    novelty ratio must estimate the exact ratio within a loose bound,
    and every sampled gram's novelty label must be exact (subset
    property: per-doc sampled counts never exceed exact counts)."""
    import random

    from dupers_ray.stages.repetition import content_novelty

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for i in range(80):
        if i % 3 == 0 and i > 0:
            texts.append(texts[i - 1])  # exact repeat: zero novelty
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(40)))
    tbl = pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": texts,
    })
    ds = rd.from_arrow(tbl).repartition(4)

    exact = content_novelty(ds, k=8).to_pandas().set_index("doc_id")
    full = content_novelty(ds, k=8, sample_ppm=1_000_000).to_pandas(
    ).set_index("doc_id")
    assert exact.sort_index().equals(full.sort_index())

    samp = content_novelty(ds, k=8, sample_ppm=300_000).to_pandas(
    ).set_index("doc_id")
    # subset property: sampled counts bounded by exact counts per doc
    joined = samp.join(exact, rsuffix="_x")
    assert (joined["n_grams"] <= joined["n_grams_x"]).all()
    assert (joined["n_novel"] <= joined["n_novel_x"]).all()
    # the sample is a real subsample, not everything
    assert samp["n_grams"].sum() < 0.6 * exact["n_grams"].sum()
    assert samp["n_grams"].sum() > 0.1 * exact["n_grams"].sum()
    # ratio estimator: corpus novelty ratio within a loose bound
    r_exact = exact["n_novel"].sum() / exact["n_grams"].sum()
    r_samp = samp["n_novel"].sum() / samp["n_grams"].sum()
    assert abs(r_samp - r_exact) < 0.1
    # repeated docs stay zero-novelty in the sample too (owner exactness)
    rep_ids = [i for i in range(1, 80) if i % 3 == 0]
    in_samp = [i for i in rep_ids if i in samp.index]
    assert (samp.loc[in_samp, "n_novel"] == 0).all()
