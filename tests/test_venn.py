"""Dedup-method Venn (pipelines/venn.py): per-bit counts on a corpus
crafted so each method catches a different duplicate kind."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.pipelines.venn import (
    EXACT_BIT,
    NEAR_BIT,
    NORM_BIT,
    SIMHASH_BIT,
    dedup_method_venn,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while seventy "
    "volunteers measure corpus duplication rates across many pages "
    "using hashes shingles signatures and banded lsh buckets daily"
)


def _corpus() -> pa.Table:
    words = _BASE.split()
    shuffled = " ".join(words[::-1])  # same token BAG, reversed order
    texts = [
        _BASE,                       # 0: original
        _BASE,                       # 1: byte-identical -> exact+norm+near(+simhash)
        _BASE.upper() + "!!!",       # 2: normalized-identical, raw differs
        shuffled,                    # 3: simhash-only (bag equal, shingles differ)
        "completely unrelated text about gardening tomatoes and rain",
        "another unique document mentioning sailboats and harbor fog",
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _bit_counts(hist) -> dict[int, int]:
    """docs carrying each bit, from the (mask, n_docs) histogram."""
    out = {EXACT_BIT: 0, NORM_BIT: 0, NEAR_BIT: 0, SIMHASH_BIT: 0}
    for mask, n in zip(hist["mask"], hist["n_docs"]):
        for b in out:
            if int(mask) & b:
                out[b] += int(n)
    return out


def test_venn_bits_discriminate_methods():
    tbl = _corpus()
    hist = dedup_method_venn(rd.from_arrow(tbl).repartition(2)).to_pandas()
    assert int(hist["n_docs"].sum()) == tbl.num_rows
    bits = _bit_counts(hist)
    # exact: only the identical pair (one keeper, one flagged)
    assert bits[EXACT_BIT] == 1
    # norm: identical pair + the case/punct variant
    assert bits[NORM_BIT] == 2
    # near (flagship): identical pair + case variant are shingle-equal
    # after lowercasing; the reversed doc's shingles differ -> not near
    assert bits[NEAR_BIT] == 2
    # simhash is order-insensitive: the reversed doc joins the dup set.
    # It owns the MIN node of the 4-doc hamming-0 set, so IT is the
    # keeper and the three other copies carry bit 8.
    assert bits[SIMHASH_BIT] == 3
    # mask 0 = the two unique docs + the reversed doc (simhash keeper)
    m0 = hist.set_index("mask")["n_docs"]
    assert int(m0.loc[0]) == 3


def test_venn_all_unique_is_all_mask_zero():
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(
            ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"],
            pa.string(),
        ),
    })
    hist = dedup_method_venn(rd.from_arrow(tbl)).to_pandas()
    assert hist["mask"].tolist() == [0]
    assert hist["n_docs"].tolist() == [3]


def test_venn_flag_split_follows_key_orders():
    """exact/norm flag the id-larger copy; near/simhash flag the
    node-larger copy — verify totals stay one-per-method for one pair."""
    tbl = pa.table({
        "doc_id": pa.array([7, 11], pa.int64()),
        "text": pa.array([_BASE, _BASE], pa.string()),
    })
    hist = dedup_method_venn(rd.from_arrow(tbl)).to_pandas()
    bits = _bit_counts(hist)
    assert bits == {EXACT_BIT: 1, NORM_BIT: 1, NEAR_BIT: 1, SIMHASH_BIT: 1}
    assert int(hist["n_docs"].sum()) == 2


def test_venn_string_ids_schema_stable():
    """String-id corpora: dup-free resolve partitions must emit string-
    typed (not null-typed) id columns so the flag union keeps one schema
    (round-4 review)."""
    import ray.data as rd

    from dupers_ray.pipelines.venn import dedup_method_venn

    docs = rd.from_items([
        {"url": f"u{i}",
         "text": ("dup dup dup alpha beta gamma delta epsilon" if i < 2
                  else f"unique {i} " + " ".join(f"w{i}{j}" for j in range(25)))}
        for i in range(12)
    ]).repartition(6)
    out = dedup_method_venn(docs, id_col="url", text_col="text").to_pandas()
    assert int(out.loc[out["mask"] == 0, "n_docs"].iloc[0]) >= 10
    assert out["n_docs"].sum() == 12
