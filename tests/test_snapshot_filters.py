"""latest_per_key (newest capture per key, deterministic tie-break) and
drop_noindex (meta-robots crawl filter over raw html bytes)."""
from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from dupers_ray.pipelines.maintenance import latest_per_key
from dupers_ray.stages.filters import drop_noindex


def test_latest_per_key_matches_brute_with_ties():
    rows = [
        # (key, order, tie) — key 1 has an order tie broken by tie_col
        (1, 10, 100), (1, 20, 101), (1, 20, 99),
        (2, 5, 7),
        (3, 1, 1), (3, 1, 2), (3, 0, 9),
    ]
    t = pa.table(
        {
            "k": [r[0] for r in rows],
            "o": [r[1] for r in rows],
            "i": [r[2] for r in rows],
        }
    )
    out = latest_per_key(
        rd.from_arrow(t).repartition(4), key_col="k", order_col="o",
        tie_col="i",
    )
    got = {r["k"]: (r["o"], r["i"]) for r in out.take_all()}
    assert got == {1: (20, 101), 2: (5, 7), 3: (1, 2)}
    assert out.count() == 3  # exactly one row per key survives


def test_drop_noindex_variants():
    pages = [
        b'<html><head><meta name="robots" content="noindex, nofollow">'
        b"</head><body>a</body></html>",
        b"<META CONTENT='NOINDEX' NAME=robots><body>b</body>",  # reversed attrs
        b'<meta name="robots" content="index, follow"><body>c</body>',
        b'<meta name="viewport" content="noindex"><body>d</body>',  # wrong meta
        b'\xff\xfe junk <meta name="robots" content="noindex">',  # invalid utf-8
        b"plain page",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(6)), "html": pa.array(pages, pa.binary())})
    ).repartition(2)
    kept = sorted(r["doc_id"] for r in drop_noindex(ds).take_all())
    assert kept == [2, 3, 5]
