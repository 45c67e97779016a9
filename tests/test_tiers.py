"""Tiered dedup attribution (pipelines/tiers.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.config import DedupConfig
from dupers_ray.pipelines.tiers import dedup_tiers, tier_summary

W = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _corpus():
    rng = np.random.default_rng(5)
    base = " ".join(rng.choice(W, 100))
    toks = base.split()
    toks[3] = "zz"
    near = " ".join(toks)
    return pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": [
            base,                           # 0 keeper of everything
            base,                           # 1 exact dup of 0
            base.upper(),                   # 2 normalized dup (case only)
            base + "!!!",                   # 3 normalized dup (punct)
            near,                           # 4 near dup of 0
            " ".join(rng.choice(W, 100)),   # 5 unrelated
            "", None,                       # 6,7 empty -> kept
            "!!!",                          # 8 normalizes to '' -> kept
            near,                           # 9 exact dup of 4
        ],
    })


EXPECTED = {0: "kept", 1: "exact", 2: "normalized", 3: "normalized",
            4: "near", 5: "kept", 6: "kept", 7: "kept", 8: "kept",
            9: "exact"}


def test_dedup_tiers_planted(ray_session):
    out = dedup_tiers(
        rd.from_arrow(_corpus()).repartition(3),
        DedupConfig(id_col="doc_id", text_col="text"),
    ).to_pandas()
    assert dict(zip(out.doc_id, out.tier)) == EXPECTED


def test_dedup_tiers_partitioning_invariant(ray_session):
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    a = dedup_tiers(rd.from_arrow(_corpus()), cfg).to_pandas()
    b = dedup_tiers(rd.from_arrow(_corpus()).repartition(7), cfg).to_pandas()
    assert dict(zip(a.doc_id, a.tier)) == dict(zip(b.doc_id, b.tier))


def test_dedup_tiers_shuffle_fallback_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the anti-join + cogroup fallbacks; labels
    must be identical to the broadcast path."""
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    a = dedup_tiers(rd.from_arrow(_corpus()), cfg).to_pandas()
    b = dedup_tiers(
        rd.from_arrow(_corpus()), cfg, broadcast_limit=0
    ).to_pandas()
    assert dict(zip(a.doc_id, a.tier)) == dict(zip(b.doc_id, b.tier))


def test_tier_summary(ray_session):
    out = dedup_tiers(
        rd.from_arrow(_corpus()),
        DedupConfig(id_col="doc_id", text_col="text"),
    )
    s = tier_summary(out).to_pandas()
    got = dict(zip(s.tier, s.n_docs))
    assert got == {"kept": 5, "exact": 2, "normalized": 2, "near": 1}
