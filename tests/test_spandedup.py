"""Duplicate-span removal vs a brute-force pure-Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def brute_force(docs: dict[int, str], k: int, min_docs: int = 2):
    toks = {d: t.split(" ") for d, t in docs.items()}
    gram_docs: dict[str, set[int]] = {}
    for d, tk in toks.items():
        for i in range(len(tk) - k + 1):
            gram_docs.setdefault(" ".join(tk[i: i + k]), set()).add(d)
    owner = {g: min(ds) for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = {}
    for d, tk in toks.items():
        covered = [False] * len(tk)
        for i in range(len(tk) - k + 1):
            g = " ".join(tk[i: i + k])
            if g in owner and owner[g] != d:
                for p in range(i, i + k):
                    covered[p] = True
        kept = [t for t, c in zip(tk, covered) if not c]
        out[d] = (len(tk), sum(covered), " ".join(kept))
    return out


def _corpus():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    shared_a = " ".join(rng.choice(vocab, 12).tolist())
    shared_b = " ".join(rng.choice(vocab, 9).tolist())
    docs = {}
    for d in range(50):
        body = " ".join(rng.choice(vocab, 25).tolist())
        if d % 5 == 0:
            docs[d] = f"{body} {shared_a}"
        elif d % 7 == 0:
            docs[d] = f"{shared_b} {body}"
        else:
            docs[d] = body
    docs[50] = ""  # empty doc edge case
    return docs


def test_remove_duplicate_spans_matches_bruteforce(ray_session):
    import ray.data as rd

    from dupers_ray.stages.spandedup import remove_duplicate_spans

    docs = _corpus()
    t = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[d] for d in sorted(docs)], pa.string()),
    })
    got = remove_duplicate_spans(
        rd.from_arrow(t).repartition(5), k=7
    ).to_pandas().set_index("doc_id").sort_index()
    exp = brute_force(docs, k=7)

    assert set(got.index) == set(exp)
    for d, (nt, nr, clean) in exp.items():
        row = got.loc[d]
        assert int(row["n_tokens"]) == nt, d
        assert int(row["n_removed"]) == nr, d
        assert row["clean_text"] == clean, d
    # the planted spans actually removed something somewhere
    assert int(got["n_removed"].sum()) > 0
    # owners (min doc of each shared span) keep their copy
    assert int(got.loc[0, "n_removed"]) == 0  # doc 0 owns shared_a grams


def test_no_dups_is_identity(ray_session):
    import ray.data as rd

    from dupers_ray.stages.spandedup import remove_duplicate_spans

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c d e f g h", "q r s t u v w x"], pa.string()),
    })
    got = remove_duplicate_spans(
        rd.from_arrow(t), k=7).to_pandas().sort_values("doc_id")
    assert got["n_removed"].tolist() == [0, 0]
    assert got["clean_text"].tolist() == [
        "a b c d e f g h", "q r s t u v w x"]
