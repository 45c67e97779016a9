"""Synthetic corpus invariants: determinism + the extraction parity rule."""

from __future__ import annotations

from dupers_ray.stages.extract import extract_text_one
from dupers_ray.synth import synth_pages


def test_synth_deterministic():
    a = synth_pages(n=300, seed=42)
    b = synth_pages(n=300, seed=42)
    assert a.pages.equals(b.pages)
    assert a.truth.equals(b.truth)
    c = synth_pages(n=300, seed=43)
    assert not c.pages.equals(a.pages)


def test_text_is_extraction_of_html(pages_small):
    # per-row invariant (BASELINE.json:input_hint): text == extract(html)
    htmls = pages_small.pages["html"].to_pylist()
    texts = pages_small.pages["text"].to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text_one(h) == t


def test_planted_structure(pages_small):
    kinds = pages_small.truth["kind"].to_pylist()
    cids = pages_small.truth["cluster_id"].to_pylist()
    from collections import Counter, defaultdict

    k = Counter(kinds)
    assert k["exact"] >= 40 and k["near"] >= 40 and k["unique"] > 300
    groups = defaultdict(list)
    for kind, cid in zip(kinds, cids):
        groups[cid].append(kind)
    exact_sizes = [len(v) for v in groups.values() if v[0] == "exact"]
    assert all(2 <= s <= 5 for s in exact_sizes)
    assert len(set(pages_small.pages["url"].to_pylist())) == pages_small.pages.num_rows
