from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from dupers_ray.functions.hashing import splitmix64
from dupers_ray.stages.cdc import (
    DEFAULT_MASK_BITS,
    DEFAULT_WINDOW,
    cdc_chunk_table,
    cdc_dedup_stats,
)
from dupers_ray.stages.minhash import _POLY


def _ref_chunks(data: bytes, w: int, mask_bits: int):
    """Slow per-doc reference: (start 1-based, length, hash) triples."""
    n = len(data)
    bounds = []
    with np.errstate(over="ignore"):
        for i in range(w - 1, n):  # window ends at byte i (0-based)
            acc = np.uint64(data[i - w + 1])
            for j in range(i - w + 2, i + 1):
                acc = acc * _POLY + np.uint64(data[j])
            sm = int(splitmix64(np.array([acc], np.uint64))[0])
            if sm & ((1 << mask_bits) - 1) == 0:
                bounds.append(i)
    ends = sorted(set(bounds) | ({n - 1} if n else set()))
    out, s = [], 0
    for e in ends:
        chunk = data[s : e + 1]
        h = int.from_bytes(
            hashlib.md5(chunk.hex().upper().encode()).digest()[:8], "big"
        )
        out.append((s + 1, e - s + 1, h))
        s = e + 1
    return out


def _run(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = cdc_chunk_table(t)
    got = {i: [] for i in range(len(texts))}
    for d, ci, st, ln, h in zip(*(out.column(c).to_pylist() for c in
                                  ["doc_id", "chunk_idx", "start", "length",
                                   "chunk_hash"])):
        got[d].append((ci, st, ln, h))
    return got


def test_matches_reference():
    rng = np.random.default_rng(13)
    texts = ["".join(chr(97 + int(x)) for x in rng.integers(0, 26, int(m)))
             for m in rng.integers(0, 400, 25)]
    texts += ["", "tiny", "x" * 7, "y" * 8]
    got = _run(texts)
    for i, txt in enumerate(texts):
        want = [(ci + 1, s, l, h) for ci, (s, l, h) in
                enumerate(_ref_chunks(txt.encode(), DEFAULT_WINDOW,
                                      DEFAULT_MASK_BITS))]
        assert got[i] == want, f"doc {i}"


def test_shift_robustness():
    """Prepending bytes must leave chunks after the first boundary
    identical — the property fixed-size blocking lacks."""
    rng = np.random.default_rng(2)
    body = "".join(chr(97 + int(x)) for x in rng.integers(0, 26, 4000))
    shifted = "PREPENDED-" + body
    a = {h for _, _, _, h in _run([body])[0]}
    b = {h for _, _, _, h in _run([shifted])[0]}
    # all but the first chunk of each doc should coincide
    assert len(a & b) >= len(a) - 2
    assert len(a & b) >= 10  # and there are many chunks at 4 kB


def test_dedup_stats(ray_session):
    import ray.data as rd

    texts = ["shared content block " * 40, "shared content block " * 40,
             "totally different text here " * 30]
    ds = rd.from_arrow(
        pa.table({"doc_id": [0, 1, 2], "text": texts})
    ).repartition(2)
    df = cdc_dedup_stats(ds)
    row = df.iloc[0]
    assert row.total_bytes == sum(len(t.encode()) for t in texts)
    # docs 0 and 1 are byte-identical: dedup must save at least their size
    assert row.distinct_bytes <= row.total_bytes - len(texts[0].encode()) + 64
    assert row.distinct_chunks < row.total_chunks
