"""BPE training (stages/bpe.py, Sennrich 2016): merge loop vs an
independent brute reference, determinism, and the distributed
word-count front end."""
from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray.data as rd

from dupers_ray.stages.bpe import bpe_merges, pair_counts, train_bpe, word_counts


def _brute_bpe(word_freq: dict[str, int], n_merges: int):
    """Independent reference: literal Sennrich loop on dicts."""
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, n in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


WORDS = {
    "lower": 5, "lowest": 2, "newer": 6, "newest": 3, "wider": 1,
    "low": 7, "new": 4, "a": 9, "ab": 1,
}


def test_train_bpe_matches_brute():
    wc = pa.table({"word": list(WORDS), "n": list(WORDS.values())})
    got = train_bpe(wc, n_merges=12)
    exp = _brute_bpe(WORDS, 12)
    assert list(map(tuple, got.to_numpy())) == exp
    # merged symbols become multi-char and keep merging
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in exp)


def test_bpe_end_to_end_and_determinism():
    texts = []
    for w, n in WORDS.items():
        texts.extend([w] * n)
    # pack words into docs of 3; tokenization is the corpus regex
    docs = [" ".join(texts[i: i + 3]) for i in range(0, len(texts), 3)]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    a = bpe_merges(rd.from_arrow(t).repartition(3), n_merges=8)
    b = bpe_merges(rd.from_arrow(t).repartition(7), n_merges=8)
    assert a.equals(b)  # partitioning-invariant
    assert list(map(tuple, a.to_numpy())) == _brute_bpe(WORDS, 8)

    wc = {r["word"]: r["n"]
          for r in word_counts(rd.from_arrow(t)).take_all()}
    assert wc == WORDS

    top = pair_counts(rd.from_arrow(t).repartition(2), k=3).take_all()
    brute_pairs = Counter()
    for w, n in WORDS.items():
        for i in range(len(w) - 1):
            brute_pairs[w[i: i + 2]] += n
    want = sorted(brute_pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["pair"], r["n"]) for r in top] == want


def test_bpe_encode_counts_matches_sequential_apply():
    """Greedy lowest-rank-first apply == replaying merges in rank order
    (the two standard statements of BPE inference), and piece counts
    bincount back to docs correctly across batch layouts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.stages.bpe import bpe_encode_counts, bpe_merges
    from dupers_ray.stages.textstats import _TOKEN_RE

    rng = np.random.default_rng(5)
    vocab = ["the", "thereby", "other", "banana", "bandana", "an", "a"]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, len(vocab), 12))
        for _ in range(80)
    ] + ["", None]
    t = pa.table({
        "doc_id": pa.array(np.arange(82, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(7)
    merges = bpe_merges(ds, n_merges=12)

    def seq_apply(word: str) -> int:
        seq = list(word)
        for _, l, r, _n in merges.itertuples(index=False):
            i, out = 0, []
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return len(seq)

    want = {
        int(i): sum(seq_apply(w) for w in _TOKEN_RE.findall((tx or "").lower()))
        for i, tx in zip(range(82), texts)
    }
    got = {
        r["doc_id"]: (r["n_pieces"], r["n_words"])
        for r in bpe_encode_counts(ds, merges).take_all()
    }
    assert {k: v[0] for k, v in got.items()} == want
    # no merges -> every piece is a single char
    got0 = {
        r["doc_id"]: r["n_pieces"]
        for r in bpe_encode_counts(
            ds, pd.DataFrame(columns=["rank", "left", "right", "n"])
        ).take_all()
    }
    chars = {
        int(i): sum(len(w) for w in _TOKEN_RE.findall((tx or "").lower()))
        for i, tx in zip(range(82), texts)
    }
    assert got0 == chars
