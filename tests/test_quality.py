"""Hashed-BoW quality scorer (stages/quality.py) kernel semantics."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from dupers_ray.functions.hashing import hash_str_u64
from dupers_ray.stages.quality import DIM, _weights, quality_score


def _w(tok: str) -> int:
    return int(_weights(hash_str_u64([tok]) % np.uint64(DIM))[0])


def test_quality_score_kernel():
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta", "alpha alpha", "", None],
        }
    )
    out = quality_score(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    wa, wb = _w("alpha"), _w("beta")
    assert rows[0]["n_tokens"] == 2 and rows[0]["score"] == wa + wb
    # occurrences count, not distinct tokens
    assert rows[1]["n_tokens"] == 2 and rows[1]["score"] == 2 * wa
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0 and rows[d]["score"] == 0
        assert rows[d]["keep"] == 0
    assert rows[0]["keep"] == int(wa + wb > 0)


def test_weights_bounded_and_deterministic():
    b = np.arange(DIM, dtype=np.uint64)
    w = _weights(b)
    assert w.min() >= -100 and w.max() <= 100
    assert np.array_equal(w, _weights(b))
    # non-degenerate table: both signs present
    assert (w > 0).any() and (w < 0).any()


def test_case_fold_and_tokenizer():
    t = pa.table({"doc_id": [0, 1], "text": ["Alpha BETA", "alpha beta"]})
    out = quality_score(t).to_pylist()
    assert out[0]["score"] == out[1]["score"]


def test_gopher_rules_boundaries(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.quality import gopher_rules

    filler = "the of and to in a is that it for on was with as be at by "
    # >=50 words, stopword hits, all-alpha, mean word length in [3, 10]
    good = (filler * 2 + "wordiness " * 30).strip()
    short = "the of tiny doc"                           # < 50 words
    no_stop = ("zzzz " * 60).strip()                    # no stopword hits
    longwords = ("the of " + "aaaaaaaaaaaaaaa " * 60).strip()  # mean len > 10
    digits = ("the of " + "12345 " * 60).strip()        # alpha fraction < 0.8
    empty = None
    tbl = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array([good, short, no_stop, longwords, digits, empty],
                         pa.string()),
    })
    out = (
        rd.from_arrow(tbl)
        .map_batches(gopher_rules, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "keep"] == 1
    assert list(out.loc[1:5, "keep"]) == [0, 0, 0, 0, 0]
    # signals are exact
    assert out.loc[1, "n_words"] == 4
    assert out.loc[2, "n_stop_hits"] == 0
    assert out.loc[5, "n_words"] == 0


def test_compression_stats_exact_values(ray_session):
    import zlib

    import ray.data as rd

    from dupers_ray.stages.quality import compression_stats

    texts = ["abc " * 500, "unique words never repeat here at all",
             "", None, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = (
        rd.from_arrow(t).repartition(2)
        .map_batches(compression_stats, batch_format="pyarrow",
                     zero_copy_batch=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, txt in enumerate(texts):
        b = (txt or "").encode()
        assert out.n_raw_bytes[i] == len(b)
        exp_c = len(zlib.compress(b, 6)) if b else 0
        assert out.n_deflate_bytes[i] == exp_c
        assert out.deflate_ppm[i] == (exp_c * 1_000_000 // max(1, len(b)) if b else 0)
    # the repetitive doc compresses far better than the unique-words doc
    assert out.deflate_ppm[0] < out.deflate_ppm[1] // 5


def test_train_bow_perceptron_matches_reference():
    """Distributed batch perceptron == single-process replay (integer
    exact), invariant to block layout, and it LEARNS a separable rule."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.functions.hashing import hash_str_u64
    from dupers_ray.stages.quality import train_bow_perceptron
    from dupers_ray.stages.textstats import _TOKEN_RE

    rng = np.random.default_rng(7)
    n, dim = 240, 512
    texts, labels = [], []
    for i in range(n):
        pos = rng.integers(0, 2) == 1
        core = "good great fine" if pos else "bad awful poor"
        noise = " ".join(f"w{int(j)}" for j in rng.integers(0, 40, 6))
        texts.append(f"{core} {noise}")
        labels.append(1 if pos else -1)
    texts += ["", None]
    labels += [1, -1]
    t = pa.table({
        "label": pa.array(np.array(labels, np.int64)),
        "text": pa.array(texts, pa.string()),
    })

    def reference(iters):
        w = np.zeros(dim, np.int64)
        feats = []
        for tx in texts:
            toks = _TOKEN_RE.findall((tx or "").lower())
            b = (hash_str_u64(toks) % np.uint64(dim)).astype(np.int64) \
                if toks else np.zeros(0, np.int64)
            feats.append(b)
        for _ in range(iters):
            g = np.zeros(dim, np.int64)
            for y, b in zip(labels, feats):
                if y * int(w[b].sum()) <= 0:
                    np.add.at(g, b, y)
            w = w + g
        return w

    for iters in (1, 3):
        want = reference(iters)
        for parts in (1, 9):
            got = np.zeros(dim, np.int64)
            rows = train_bow_perceptron(
                rd.from_arrow(t).repartition(parts),
                label_col="label", dim=dim, iters=iters,
            ).take_all()
            for r in rows:
                got[r["dim_id"]] = r["weight"]
            assert (got == want).all()

    # after 3 iters the learned w separates the planted rule better
    # than w after 1 (misclassification count strictly drops)
    def misses(w):
        c = 0
        for y, tx in zip(labels, texts):
            toks = _TOKEN_RE.findall((tx or "").lower())
            b = (hash_str_u64(toks) % np.uint64(dim)).astype(np.int64) \
                if toks else np.zeros(0, np.int64)
            if y * int(w[b].sum()) <= 0:
                c += 1
        return c

    # the planted rule is learned: after 1 iter only the two token-less
    # rows (margin always 0) remain misclassified, and more iters never
    # regress
    assert misses(reference(3)) <= misses(reference(1)) <= 2


def test_score_with_bow_weights_roundtrip():
    """Scoring the training set under the learned weights reproduces the
    margins the next training iteration would see (train(k) + score ==
    the margin pass of train(k+1))."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.functions.hashing import hash_str_u64
    from dupers_ray.stages.quality import (
        score_with_bow_weights, train_bow_perceptron,
    )
    from dupers_ray.stages.textstats import _TOKEN_RE

    texts = [f"alpha beta w{i % 9} gamma" if i % 3 else f"delta w{i % 9}"
             for i in range(60)]
    labels = [1 if i % 2 == 0 else -1 for i in range(60)]
    t = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "label": pa.array(np.array(labels, np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(4)
    wtab = train_bow_perceptron(ds, label_col="label", dim=512, iters=2)
    got = {r["doc_id"]: (r["score"], r["pred"])
           for r in score_with_bow_weights(ds, wtab, dim=512).take_all()}

    w = np.zeros(512, np.int64)
    for r in wtab.take_all():
        w[r["dim_id"]] = r["weight"]
    for i, tx in enumerate(texts):
        b = (hash_str_u64(_TOKEN_RE.findall(tx.lower()))
             % np.uint64(512)).astype(np.int64)
        s = int(w[b].sum())
        assert got[i] == (s, int(np.sign(s)))


# ---------------------------------------------------------------------------
# Per-source quality dashboard (pipelines/report.source_quality_report)
# ---------------------------------------------------------------------------


def test_source_quality_report_composes_kernels():
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.report import source_quality_report
    from dupers_ray.stages.quality import gopher_rules, quality_score

    texts = [
        " ".join(["the quick brown fox jumps over a lazy dog again"] * 10),
        " ".join(["another page with the usual stopword mix in it"] * 10),
        "tiny",                   # fails gopher min-words
        None,                     # null text
    ]
    # two sources; doc 1 text duplicated into source b twice -> 1 exact dup
    tbl = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": texts + [texts[1]],
        "source": ["a", "a", "b", "b", "b"],
    })
    got = (
        source_quality_report(rd.from_arrow(tbl).repartition(3))
        .to_pandas().set_index("source")
    )
    g = gopher_rules(tbl).to_pandas().set_index("doc_id")
    q = quality_score(tbl).to_pandas().set_index("doc_id")
    for src, ids in {"a": [0, 1], "b": [2, 3, 4]}.items():
        assert got.loc[src, "n_docs"] == len(ids)
        assert got.loc[src, "n_gopher_pass"] == g.loc[ids, "keep"].sum()
        assert got.loc[src, "sum_quality"] == q.loc[ids, "score"].sum()
        assert got.loc[src, "n_quality_keep"] == q.loc[ids, "keep"].sum()
    # doc 4 duplicates doc 1's text; keep-first drops the larger id
    assert got.loc["a", "n_exact_dup"] == 0
    assert got.loc["b", "n_exact_dup"] == 1


def test_top_quality_per_source_partial_merge_invariant():
    """Partial per-batch top-k folds must equal the single-partition
    answer at any block layout, including ties broken by min id."""
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.report import top_quality_per_source
    from dupers_ray.stages.quality import quality_score

    texts = [f"word{i} alpha beta gamma delta common tail tokens" for i in range(20)]
    tbl = pa.table({
        "doc_id": list(range(20)),
        "text": texts,
        "source": ["a", "b"] * 10,
    })
    one = top_quality_per_source(rd.from_arrow(tbl), k=3).to_pandas()
    many = top_quality_per_source(
        rd.from_arrow(tbl).repartition(7), k=3
    ).to_pandas()
    key = lambda df: df.sort_values(["source", "rank"]).values.tolist()  # noqa: E731
    assert key(one) == key(many)
    # cross-check against a pandas reference
    q = quality_score(tbl).to_pandas()
    q["source"] = tbl.column("source").to_pylist()
    exp = (
        q.sort_values(["source", "score", "doc_id"],
                      ascending=[True, False, True])
        .groupby("source").head(3)
    )
    got = one.sort_values(["source", "rank"])
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
