from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.lmstats import corpus_vocab, doc_freq_stats


def _docs():
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "",                          # empty doc -> all-zero stats row
        "zyzzyva the",               # hapax + common token
        "THE Cat SAT",               # case-folds onto doc 0's tokens
        "numbers 123 and_under scores",
        None,
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)


def _brute(texts):
    import re
    from collections import Counter

    tok = re.compile(r"[a-z0-9_]+")
    docs = [tok.findall((t or "").lower()) for t in texts]
    vocab = Counter(w for d in docs for w in d)
    rows = []
    for i, d in enumerate(docs):
        fr = [vocab[w] for w in d]
        rows.append({
            "doc_id": i, "n_tokens": len(d), "n_distinct": len(set(d)),
            "sum_freq": sum(fr), "n_hapax": sum(f == 1 for f in fr),
            "min_freq": min(fr) if fr else 0,
        })
    return rows


def test_doc_freq_stats_matches_bruteforce():
    texts = [
        "the cat sat on the mat", "the dog sat on the log", "",
        "zyzzyva the", "THE Cat SAT", "numbers 123 and_under scores", None,
    ]
    got = doc_freq_stats(_docs(), strategy="broadcast").to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = _brute(texts)
    assert len(got) == len(exp)
    for i, e in enumerate(exp):
        for k, v in e.items():
            assert got.loc[i, k] == v, (i, k, got.loc[i].to_dict(), e)


def test_strategies_equal():
    ds = _docs()
    a = doc_freq_stats(ds, strategy="broadcast").to_pandas()
    b = doc_freq_stats(ds, strategy="join").to_pandas()
    cols = ["doc_id", "n_tokens", "n_distinct", "sum_freq", "n_hapax", "min_freq"]
    a = a[cols].sort_values("doc_id").reset_index(drop=True)
    b = b[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))


def test_strategies_equal_synth(pages_small):
    pages = pages_small.pages.select(["text"]).append_column(
        "doc_id", pa.array(np.arange(pages_small.pages.num_rows), pa.int64())
    )
    ds = rd.from_arrow(pages).repartition(4)
    a = doc_freq_stats(ds, strategy="broadcast").to_pandas()
    b = doc_freq_stats(ds, strategy="join").to_pandas()
    cols = ["doc_id", "n_tokens", "n_distinct", "sum_freq", "n_hapax", "min_freq"]
    a = a[cols].sort_values("doc_id").reset_index(drop=True)
    b = b[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))


def test_corpus_vocab_counts():
    v = corpus_vocab(_docs()).to_pandas().set_index("token")["n"]
    assert v["the"] == 6
    assert v["zyzzyva"] == 1
    assert v["123"] == 1


def test_doc_rare_terms_matches_bruteforce():
    import re
    from collections import Counter

    from dupers_ray.stages.lmstats import doc_rare_terms

    texts = [
        "common common rare1 common shared",
        "common shared rare2 rare2",
        "common common common",
        "", None,
        "zzz aaa zzz",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    out = doc_rare_terms(ds, k=2).to_pandas().sort_values(
        ["doc_id", "rk"]).reset_index(drop=True)

    tok = re.compile(r"[a-z0-9_]+")
    docs = [tok.findall((t or "").lower()) for t in texts]
    df = Counter()
    for d in docs:
        df.update(set(d))
    exp = []
    for i, d in enumerate(docs):
        tf = Counter(d)
        ranked = sorted(tf, key=lambda w: (df[w], -tf[w], w))[:2]
        for rk, w in enumerate(ranked, 1):
            exp.append((i, rk, w, df[w], tf[w]))
    got = list(out.itertuples(index=False, name=None))
    assert got == exp
