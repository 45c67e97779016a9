"""embed_texts actor-pool stage (stages/embed_texts.py) — value-checked
against an INDEPENDENT scalar re-implementation of the featurizer spec
(md5-u64 bucket, splitmix64 weights), plus the text → SemDeDup chain."""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dupers_ray.stages.embed_texts import TextEmbedder, embed_texts

MASK = (1 << 64) - 1


def _splitmix64_scalar(x: int) -> int:
    # written from the splitmix64 spec, NOT imported from the engine
    x = (x + 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


def _ref_embed(text: str | None, dim: int, n_buckets: int) -> tuple[list[int], int]:
    if text is None:
        return [0] * dim, 0
    toks = re.findall(r"[a-z0-9_]+", text.lower())
    emb = [0] * dim
    for t in toks:
        b = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") % n_buckets
        for j in range(dim):
            emb[j] += _splitmix64_scalar(b * dim + j) % 201 - 100
    return emb, len(toks)


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox",
    None,
    "",
    "...!!!",  # tokenless
    "ZETA zeta Zeta",  # case folding collapses to one token x3
    "unicode straße café tokens",
]


def test_matches_independent_reference():
    dim, nb = 16, 64  # small dims so the scalar reference stays fast
    emb = TextEmbedder(dim=dim, n_buckets=nb)
    out = emb(pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS}))
    got_emb = out.column("embedding").to_pylist()
    got_nt = out.column("n_tokens").to_pylist()
    for i, text in enumerate(TEXTS):
        exp, nt = _ref_embed(text, dim, nb)
        assert got_nt[i] == nt
        assert [int(v) for v in got_emb[i]] == exp, f"doc {i}"


def test_batch_split_invariance():
    emb = TextEmbedder(dim=8, n_buckets=32)
    whole = emb(pa.table({"doc_id": [0, 1, 2], "text": TEXTS[:3]}))
    parts = [
        emb(pa.table({"doc_id": [i], "text": [TEXTS[i]]})) for i in range(3)
    ]
    assert whole.column("embedding").to_pylist() == [
        p.column("embedding").to_pylist()[0] for p in parts
    ]


def test_actor_pool_dataset_stage():
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
    ).repartition(3)
    out = embed_texts(ds, dim=16, n_buckets=64, concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(TEXTS)
    assert out.loc[2, "n_tokens"] == 0  # null text
    assert all(v == 0.0 for v in out.loc[2, "embedding"])
    exp, _ = _ref_embed(TEXTS[0], 16, 64)
    assert [int(v) for v in out.loc[0, "embedding"]] == exp


def test_chain_into_semantic_dedup():
    from dupers_ray.stages.semdedup import semantic_dedup

    rows = {
        "doc_id": list(range(6)),
        "text": [
            "alpha beta gamma delta",
            "alpha beta gamma delta",      # exact content dup of 0
            "alpha beta gamma delta zeta",  # near dup of 0
            "totally different words here",
            "another unrelated document body",
            None,                           # tokenless -> filtered
        ],
    }
    ds = rd.from_arrow(pa.table(rows))
    emb = embed_texts(ds, concurrency=1).filter(
        expr="n_tokens > 0"
    )
    out = semantic_dedup(
        emb, n_clusters=2, threshold=0.9, id_col="doc_id"
    ).to_pandas().set_index("doc_id")
    assert len(out) == 5  # null-text doc excluded
    assert bool(out.loc[0, "keep"])
    # identical text -> identical embedding -> cosine 1 -> pruned
    assert not bool(out.loc[1, "keep"])
    assert bool(out.loc[3, "keep"]) and bool(out.loc[4, "keep"])
