"""Link-graph extraction + integer PageRank (stages/linkgraph.py):
vectorized href extraction (https kept, relative/ftp dropped), planted
edge arithmetic, and power-iteration values vs a direct Python
reference."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.linkgraph import PPM, extract_links, pagerank
from dupers_ray.synth import synth_doc_html


def _pages(n: int = 12) -> pa.Table:
    batch = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(n)]),
    })
    return synth_doc_html(batch, n_docs=n)


def test_extract_links_planted_edges():
    n = 12
    ds = rd.from_arrow(_pages(n)).repartition(3)
    got = extract_links(ds).to_pandas().sort_values(
        ["doc_id", "dst_host"]).reset_index(drop=True)
    exp = []
    for i in range(n):
        for j in range(1 + i % 3):
            exp.append((i, f"host{i}.example",
                        f"host{(i * 31 + 7 * j + 1) % n}.example"))
    exp = sorted(exp, key=lambda r: (r[0], r[2]))
    assert list(map(tuple, got.values.tolist())) == exp


def test_extract_drops_relative_and_ftp():
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "src_host": pa.array(["me.example"]),
        "html": pa.array([
            b'<a href="/rel">x</a><a href="ftp://f/x">y</a>'
            b'<a href="https://ok.example/p">z</a>no href here'
        ], pa.binary()),
    })
    got = extract_links(rd.from_arrow(t)).to_pandas()
    assert got["dst_host"].tolist() == ["ok.example"]


def test_extract_no_links_page():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "src_host": pa.array(["a.example", "b.example"]),
        "html": pa.array([b"<p>nothing</p>",
                          b'<a href="https://a.example/x">y</a>'], pa.binary()),
    })
    got = extract_links(rd.from_arrow(t)).to_pandas()
    assert got["doc_id"].tolist() == [1]


def _py_pagerank(edges: list[tuple[str, str]], iters: int = 2) -> dict[str, int]:
    hosts = sorted({h for e in edges for h in e})
    outdeg = {h: 0 for h in hosts}
    for s, _ in edges:
        outdeg[s] += 1
    r = {h: PPM for h in hosts}
    for _ in range(iters):
        nxt = {h: 150_000 for h in hosts}
        for s, d in edges:
            nxt[d] += (85 * r[s]) // (100 * outdeg[s])
        r = nxt
    return r


def test_pagerank_matches_python_reference():
    n = 12
    links = extract_links(rd.from_arrow(_pages(n)).repartition(3))
    got = pagerank(links.select_columns(["src_host", "dst_host"]), iters=2)
    got_map = dict(zip(got.column("host").to_pylist(),
                       got.column("pr_ppm").to_pylist()))
    edges = [(f"host{i}.example", f"host{(i * 31 + 7 * j + 1) % n}.example")
             for i in range(n) for j in range(1 + i % 3)]
    assert got_map == _py_pagerank(edges)
    # mass sanity: every node keeps the base even with no in-links
    assert min(got_map.values()) >= 150_000


def test_pagerank_sink_and_source():
    # a -> b, b has no out-links (dangling: contributes nothing),
    # c is isolated on the src side only via self-loop-free edge c -> a
    edges = rd.from_arrow(pa.table({
        "src_host": pa.array(["a", "c"]),
        "dst_host": pa.array(["b", "a"]),
    }))
    got = pagerank(edges, iters=1)
    m = dict(zip(got.column("host").to_pylist(),
                 got.column("pr_ppm").to_pylist()))
    assert m == {
        "a": 150_000 + (85 * PPM) // 100,
        "b": 150_000 + (85 * PPM) // 100,
        "c": 150_000,
    }


# ------------------------------------------------------- fuzz robustness

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_links_batch_total_on_garbage(blob):
    """The extraction kernel never raises on arbitrary html bytes
    (non-UTF-8 decodes lossily; malformed hrefs drop to zero rows) —
    drives links_batch directly, no Ray dataset per example."""
    from dupers_ray.stages.linkgraph import links_batch

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "src_host": pa.array(["f.example", "g.example"]),
        "html": pa.array(
            [blob, blob + b'<a href="https://ok.example/x">y</a>'],
            pa.binary(),
        ),
    })
    got = links_batch(t)
    hosts = got.column("dst_host").to_pylist()
    assert all(h for h in hosts)
    # the well-formed trailing link must survive whatever precedes it,
    # unless the garbage opens an unterminated href=" quote that
    # swallows it or splits it (both correct parses of broken html)
    if b'href="' not in blob and b'"' not in blob:
        assert "ok.example" in hosts


def test_hits_matches_python_reference():
    from dupers_ray.stages.linkgraph import hits

    n = 12
    links = extract_links(rd.from_arrow(_pages(n)).repartition(3))
    got = hits(links.select_columns(["src_host", "dst_host"]))
    edges = [(f"host{i}.example", f"host{(i * 31 + 7 * j + 1) % n}.example")
             for i in range(n) for j in range(1 + i % 3)]
    hosts = sorted({h for e in edges for h in e})
    a1 = {h: 0 for h in hosts}
    for _, d in edges:
        a1[d] += PPM
    mx = max(a1.values()) or 1
    auth = {h: (v * PPM) // mx for h, v in a1.items()}
    h1 = {h: 0 for h in hosts}
    for s, d in edges:
        h1[s] += auth[d]
    mh = max(h1.values()) or 1
    hub = {h: (v * PPM) // mh for h, v in h1.items()}
    gm = {r["host"]: (r["auth_ppm"], r["hub_ppm"]) for r in got.to_pylist()}
    assert gm == {h: (auth[h], hub[h]) for h in hosts}
    assert max(v[0] for v in gm.values()) == PPM  # normalization pins max


def test_links_batch_null_html_rows():
    from dupers_ray.stages.linkgraph import links_batch

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "src_host": pa.array(["a.example", "b.example"]),
        "html": pa.array([None, '<a href="https://x.example/p">y</a>'],
                         pa.string()),
    })
    got = links_batch(t)
    assert got.column("dst_host").to_pylist() == ["x.example"]
    tb = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "src_host": pa.array(["a.example"]),
        "html": pa.array([None], pa.binary()),
    })
    assert len(links_batch(tb)) == 0


def test_scale_ppm_overflow_safe():
    from dupers_ray.stages.linkgraph import _scale_ppm

    v = np.array([10_000_000_000_000, 5_000_000_000_000, 0], np.int64)
    got = _scale_ppm(v)  # max*PPM = 1e19 > 2^63: exact python-int path
    assert got.tolist() == [1_000_000, 500_000, 0]
    small = np.array([3, 1], np.int64)
    assert _scale_ppm(small).tolist() == [1_000_000, 333_333]


def test_anchor_extraction_and_profiles():
    from dupers_ray.stages.linkgraph import anchor_profiles

    n = 12
    links = extract_links(rd.from_arrow(_pages(n)).repartition(3),
                          anchors=True)
    got = links.to_pandas()
    exp_anchor = {
        (i, f"host{(i * 31 + 7 * j + 1) % n}.example"): f"t{(i + j) % 7}"
        for i in range(n) for j in range(1 + i % 3)
    }
    for _, r in got.iterrows():
        assert r["anchor"] == exp_anchor[(r["doc_id"], r["dst_host"])]

    prof = anchor_profiles(links).to_pandas()
    from collections import Counter

    exp = Counter()
    for (_, dst), a in exp_anchor.items():
        exp[(dst, a)] += 1
    assert Counter(
        {(r.dst_host, r.anchor): r.n for r in prof.itertuples()}
    ) == exp


def test_anchor_unclosed_tag_empty():
    from dupers_ray.stages.linkgraph import links_batch

    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "src_host": pa.array(["a.example"]),
        "html": pa.array(['<a href="https://x.example/p'], pa.string()),
    })
    got = links_batch(t, anchors=True)
    assert got.column("dst_host").to_pylist() == ["x.example"]
    assert got.column("anchor").to_pylist() == [""]


def test_drop_nofollow_scopes_to_rel_value():
    from dupers_ray.stages.linkgraph import links_batch

    html = (
        '<a href="https://keep1.example/a" rel="x">k</a>'
        '<a href="https://drop.example/b" rel="nofollow">d</a>'
        "<a href=\"https://drop2.example/c\" REL='ugc nofollow'>d</a>"
        '<a href="https://keep2.example/d">k</a>'
        # "nofollow" in prose after the tag closes must not poison the link
        '<a href="https://keep3.example/e" rel="me">see nofollow docs</a>'
    )
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "src_host": pa.array(["s.example"]),
        "html": pa.array([html], pa.string()),
    })
    kept = links_batch(t, drop_nofollow=True).column("dst_host").to_pylist()
    assert kept == ["keep1.example", "keep2.example", "keep3.example"]
    # default keeps everything
    assert len(links_batch(t)) == 5


def test_alternate_links_extraction():
    from dupers_ray.stages.linkgraph import alternate_links

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "html": pa.array([
            '<html><head>'
            '<link rel="alternate" hreflang="fr" href="https://f.example/p">'
            "<LINK REL=alternate HREFLANG='DE' href='https://d.example/p'>"
            '<link rel="stylesheet" href="https://x.css">'
            "</head></html>",
            "<p>no links at all</p>",
        ], pa.string()),
    })
    out = alternate_links(t)
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("hreflang").to_pylist(),
                    out.column("href").to_pylist()))
    assert rows == [
        (0, "fr", "https://f.example/p"),
        (0, "de", "https://d.example/p"),  # case-folded lang
    ]


def test_feed_links_discovery():
    import pyarrow as pa

    from dupers_ray.stages.linkgraph import feed_links

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "html": [
            b'<link rel="alternate" type="application/rss+xml" '
            b'href="https://a.example/feed.xml">',
            b"<LINK TYPE='application/ATOM+xml' "
            b"HREF='https://b.example/atom' REL=alternate>",
            b'<link rel="alternate" hreflang="de" '
            b'href="https://c.example/de">',       # decoy: no feed type
            b'<link rel="stylesheet" type="text/css" href="/s.css">',
            b"\xff\xfe not even html",
        ],
    })
    out = feed_links(t)
    assert out.column("doc_id").to_pylist() == [1, 2]
    assert out.column("feed_type").to_pylist() == ["rss", "atom"]
    assert out.column("href").to_pylist() == [
        "https://a.example/feed.xml", "https://b.example/atom"]


def test_og_extract_variants_and_decoys():
    import pyarrow as pa

    from dupers_ray.stages.linkgraph import og_extract

    html = [
        # clean + messy order + unquoted + decoys
        b'<html><head><meta charset="utf-8">'
        b'<meta property="og:title" content="A Title">'
        b"<META CONTENT='https://x/i.png' PROPERTY=og:image>"
        b'<meta name=twitter:card content=summary>'
        b'<meta name="description" content="drop me">'
        b'</head><body>og:title in prose</body></html>',
        # two tags in ONE piece boundary + empty page
        b'<meta property="og:url" content="https://a/"><p x="y">'
        b'<meta name="twitter:site" content="@me">',
        b"",
        None,
    ]
    t = pa.table({"doc_id": [0, 1, 2, 3], "html": pa.array(html, pa.binary())})
    out = og_extract(t)
    rows = sorted(zip(out.column("doc_id").to_pylist(),
                      out.column("prop").to_pylist(),
                      out.column("content").to_pylist()))
    assert rows == [
        (0, "og:image", "https://x/i.png"),
        (0, "og:title", "A Title"),
        (0, "twitter:card", "summary"),
        (1, "og:url", "https://a/"),
        (1, "twitter:site", "@me"),
    ]


def test_pagerank_grouped_equals_broadcast():
    """VERDICT r3 #3: above broadcast_limit the engine must degrade to the
    int-keyed groupby-sum path automatically and produce IDENTICAL integer
    ranks. Forces a tiny limit so the 12-host graph takes the grouped
    path; also exercises mode='grouped' explicitly."""
    import pandas as pd

    n = 12
    links = extract_links(rd.from_arrow(_pages(n)).repartition(3))
    edges = links.select_columns(["src_host", "dst_host"]).materialize()
    bc = pagerank(edges, iters=2, mode="broadcast")
    exp = dict(zip(bc.column("host").to_pylist(), bc.column("pr_ppm").to_pylist()))

    auto = pagerank(edges, iters=2, broadcast_limit=3)  # auto-degrade
    assert not isinstance(auto, pa.Table)  # grouped path returns a Dataset
    got = auto.to_pandas()
    assert dict(zip(got["host"], got["pr_ppm"])) == exp

    forced = pagerank(edges, iters=2, mode="grouped").to_pandas()
    assert dict(zip(forced["host"], forced["pr_ppm"])) == exp

    # mode='broadcast' must NOT silently degrade
    import pytest
    from dupers_ray.stages.linkgraph import HostVectorTooLarge

    with pytest.raises(HostVectorTooLarge):
        pagerank(edges, iters=1, mode="broadcast", broadcast_limit=3)


def test_hits_grouped_equals_broadcast():
    from dupers_ray.stages.linkgraph import hits

    n = 12
    links = extract_links(rd.from_arrow(_pages(n)).repartition(3))
    edges = links.select_columns(["src_host", "dst_host"]).materialize()
    bc = hits(edges, mode="broadcast")
    exp = {r["host"]: (r["auth_ppm"], r["hub_ppm"]) for r in bc.to_pylist()}

    got = hits(edges, broadcast_limit=3).to_pandas()  # auto-degrade
    gm = {r.host: (r.auth_ppm, r.hub_ppm) for r in got.itertuples()}
    assert gm == exp
