"""URL canonicalization: kernel vs an independent urllib reference,
idempotence (hypothesis), and the Dataset-level dedup/rollup pipelines."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dupers_ray.stages.urlnorm import (
    TRACKING_RE,
    canonical_url,
    registrable_domain,
)

_TRACK = re.compile(TRACKING_RE)


def ref_canonical(url: str | None) -> str | None:
    """Independent reference: urllib.parse + plain Python, same contract."""
    if url is None:
        return None
    u = re.sub(r"#.*$", "", url).strip()
    sp = urlsplit(u) if "://" in u else None
    if sp is None or not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*$", sp.scheme or ""):
        return u
    scheme = sp.scheme.lower()
    auth = sp.netloc.lower()
    if scheme == "http":
        auth = re.sub(r":80$", "", auth)
    elif scheme == "https":
        auth = re.sub(r":443$", "", auth)
    path = re.sub(r"/+$", "", sp.path) or "/"
    toks = sorted(
        t for t in sp.query.split("&") if t and not _TRACK.match(t)
    )
    q = "&".join(toks)
    return f"{scheme}://{auth}{path}" + (f"?{q}" if q else "")


CASES = [
    "  HTTP://WWW.Example.COM:80/a/b/?b=2&a=1&utm_source=x#frag ",
    "https://site.org:443/",
    "https://site.org",
    "http://h.example.net/path//",
    "http://h.example.net/path/?utm_campaign=z",
    "http://host/?&&",
    "http://host/p?z=1&a=2&a=1",
    "ftp://Host.Com:21/file",
    "https://a.b.example.co.uk/x?fbclid=abc&keep=1",
    "http://host:8080/q?gclid=1",
    "https://x.com/%7Euser/Page?A=B&a=b",
    None,
]


def _canon_list(urls):
    t = pa.table({"url": pa.array(urls, pa.string())})
    return canonical_url(t).column("url_canon").to_pylist()


def test_kernel_matches_urllib_reference():
    assert _canon_list(CASES) == [ref_canonical(u) for u in CASES]


def test_idempotent_on_cases():
    once = _canon_list(CASES)
    assert _canon_list(once) == once


_part = st.text(
    alphabet="abcXYZ019-._~%&=?/:#", min_size=0, max_size=12
)


@settings(max_examples=200, deadline=None)
@given(
    scheme=st.sampled_from(["http", "HTTP", "https", "ftp"]),
    host=st.from_regex(r"[A-Za-z0-9.\-]{1,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    rest=_part,
)
def test_property_matches_reference_and_idempotent(scheme, host, port, rest):
    url = f"{scheme}://{host}{port}/{rest}"
    got = _canon_list([url])[0]
    assert got == ref_canonical(url)
    assert _canon_list([got])[0] == got


def test_registrable_domain():
    t = pa.table({"url_canon": pa.array(
        ["https://a.b.example.com/x", "http://host/", "https://co.uk/",
         "notaurl", None])})
    assert registrable_domain(t).column("domain").to_pylist() == [
        "example.com", "host", "co.uk", None, None]


@pytest.fixture()
def url_docs():
    urls, ids = [], []
    for i in range(60):
        base, v = i // 3, i % 3
        host = f"sub{base % 4}.dom{base % 20}.example.com"
        if v == 0:
            u = f"https://{host}/p/{base}?a=1&b={base % 5}"
        elif v == 1:
            u = f"HTTPS://{host.upper()}:443/p/{base}/?b={base % 5}&a=1"
        else:
            u = f"https://{host}/p/{base}?b={base % 5}&utm_source=f&a=1#s"
        urls.append(u)
        ids.append(i)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "url": pa.array(urls, pa.string()),
                     "n_chars": pa.array([len(u) for u in urls], pa.int64())})


def test_url_dup_groups_unifies_crawl_variants(ray_session, url_docs):
    import ray.data as rd

    from dupers_ray.pipelines.urls import url_dup_groups

    out = url_dup_groups(
        rd.from_arrow(url_docs).repartition(7)).to_pandas()
    assert len(out) == 20  # 60 docs / 3 variants
    assert (out["n_dups"] == 3).all()
    # survivor is the min doc_id of each triple: 0, 3, 6, ...
    assert sorted(out["keep_doc"]) == [3 * b for b in range(20)]


def test_domain_rollup(ray_session, url_docs):
    import ray.data as rd

    from dupers_ray.pipelines.urls import domain_rollup

    out = domain_rollup(
        rd.from_arrow(url_docs).repartition(5), size_col="n_chars"
    ).to_pandas()
    # all hosts share registrable domain example.com
    assert list(out["domain"]) == ["example.com"]
    assert int(out["n"].iloc[0]) == 60
    assert int(out["total_bytes"].iloc[0]) == int(url_docs["n_chars"].to_pandas().sum())


def test_domain_top_terms(ray_session):
    import ray.data as rd

    from dupers_ray.pipelines.urls import domain_top_terms

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": pa.array([
            "https://a.one.com/x", "https://b.one.com/y",
            "https://two.org/z", "https://two.org/w"], pa.string()),
        "text": pa.array([
            "cat cat dog", "cat bird", "fish fish fish cat", None],
            pa.string()),
    })
    out = domain_top_terms(
        rd.from_arrow(t).repartition(3), n=2
    ).to_pandas().sort_values(["domain", "n", "token"],
                              ascending=[True, False, True])
    rows = list(map(tuple, out.to_numpy()))
    # one.com: cat x3, then bird/dog tie -> bird (token asc)
    # two.org: fish x3, cat x1
    assert rows == [("one.com", "cat", 3), ("one.com", "bird", 1),
                    ("two.org", "fish", 3), ("two.org", "cat", 1)]


def test_surt_key_cases():
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import surt_key

    t = pa.table({"url_canon": [
        "https://www.a.b.example/p?q=1",   # www stripped, labels reversed
        "https://example.com/",
        "https://single/x",                 # single-label host
        "https://host.example:8080/p",      # port dropped
        "http://x.y/",                      # scheme dropped either way
        "not a url",                        # null out
        None,
        "",                                 # empty string -> null
    ]})
    got = surt_key(t).column("surt").to_pylist()
    assert got == [
        "example,b,a)/p?q=1",
        "com,example)/",
        "single)/x",
        "example,host)/p",
        "y,x)/",
        None,
        None,
        None,
    ]


def test_surt_key_batch_permutation_is_per_list():
    """The within-list reversal must not leak labels across rows —
    mixed label counts in one batch."""
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import surt_key

    t = pa.table({"url_canon": [
        "https://a.b.c.d.example/1",
        "https://q.example/2",
        "https://x.y.z/3",
    ]})
    got = surt_key(t).column("surt").to_pylist()
    assert got == [
        "example,d,c,b,a)/1", "example,q)/2", "z,y,x)/3",
    ]


def test_surt_reversal_property():
    """SURT host reversal is an involution: reversing the comma labels
    of the surt recovers the (www/port-stripped) host — for random
    label shapes across a mixed batch."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from dupers_ray.stages.urlnorm import surt_key

    label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0-9", min_size=1,
                    max_size=6)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.lists(label, min_size=1, max_size=5), min_size=1,
                    max_size=8))
    def check(hostlists):
        # a literal leading "www" label is (correctly) stripped by SURT —
        # exclude it so the involution property is well-defined
        hostlists = [ls for ls in hostlists if ls[0] != "www"] or [["a"]]
        hosts = [".".join(ls) for ls in hostlists]
        t = pa.table({"url_canon": [f"https://{h}/p" for h in hosts]})
        got = surt_key(t).column("surt").to_pylist()
        for h, s in zip(hosts, got):
            rev, _, rest = s.partition(")")
            assert rest == "/p"
            assert ".".join(reversed(rev.split(","))) == h

    check()


def test_surt_dup_groups_collapses_www_variants():
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import surt_dup_groups, url_dup_groups

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "url": [
            "https://www.a.example/p",
            "https://a.example/p",        # same page, bare host
            "https://a.example:443/p",    # default port -> canonical strips
            "https://b.example/p",
        ],
    })
    ds = rd.from_arrow(t).repartition(2)
    s = {r["surt"]: (r["n_dups"], r["keep_doc"])
         for r in surt_dup_groups(ds).take_all()}
    assert s == {"example,a)/p": (3, 0), "example,b)/p": (3 - 2, 3)}
    # canonical-url dedup keeps www distinct (ports already collapse)
    u = {r["url_canon"]: r["n_dups"] for r in url_dup_groups(ds).take_all()}
    assert u["https://www.a.example/p"] == 1
    assert u["https://a.example/p"] == 2


def test_extract_canonical_href_variants():
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import extract_canonical_href

    t = pa.table({
        "url": ["https://self1/", "https://self2/", "https://self3/",
                "https://self4/", "https://self5/"],
        "html": pa.array([
            b'<link rel="canonical" href="https://c.example/x">',
            b"<LINK HREF='https://d.example/y' REL=canonical>",  # reversed
            b'<link rel="stylesheet" href="https://nope.css">',  # wrong rel
            b"\xff\xfe garbage",                                 # bad bytes
            None,
        ], pa.binary()),
    })
    got = extract_canonical_href(t).column("canonical").to_pylist()
    assert got == [
        "https://c.example/x", "https://d.example/y",
        "https://self3/", "https://self4/", "https://self5/",
    ]


def test_revisit_collapse_matches_bruteforce():
    import numpy as np
    import ray.data as rd

    from dupers_ray.functions.hashing import hash_str_u64
    from dupers_ray.pipelines.urls import revisit_collapse

    rng = np.random.default_rng(11)
    n = 400
    urls = [f"https://h{int(i)}.example/p" for i in rng.integers(0, 23, n)]
    ts = np.arange(n, dtype=np.int64) * 1000
    # payload version changes at random capture indices -> runs of revisits
    digests = hash_str_u64(
        [f"{u}:{int(v)}" for u, v in zip(urls, rng.integers(0, 4, n))]
    )
    t = pa.table({"url": urls, "ts": ts, "digest": digests})

    # brute force: first ts per (url, digest) is the original
    first: dict[tuple, int] = {}
    for u, s, d in sorted(zip(urls, ts, digests), key=lambda r: r[1]):
        first.setdefault((u, int(d)), int(s))
    want = {
        (u, int(s)): (int(int(s) > first[(u, int(d))]), first[(u, int(d))])
        for u, s, d in zip(urls, ts, digests)
    }

    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        got = {
            (r["url"], r["ts"]): (r["is_revisit"], r["ref_ts"])
            for r in revisit_collapse(ds).take_all()
        }
        assert got == want
    # sanity: both classes present
    assert 0 < sum(v[0] for v in want.values()) < n


def test_page_identity_resolution(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import page_identity
    from dupers_ray.synth import synth_redirect_pages

    n = 60
    fix = synth_redirect_pages(
        pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    pages = rd.from_arrow(fix.select(["doc_id", "url", "html"]))
    redirects = rd.from_arrow(pa.table({
        "id": fix.column("doc_id"), "ptr": fix.column("ptr")}))
    out = page_identity(pages, redirects, rounds=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    # redirect → landing canonical → SURT merges decorated heads:
    # identity cluster is the 12-group head
    assert out.cluster.tolist() == [i - i % 12 for i in range(n)]


def test_page_identity_ignores_decoy_declarations(ray_session):
    """A redirecting page's own rel=canonical must be void: if the
    resolver read it, doc 1 (decoy to trap1.example) would split from
    its group."""
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import page_identity

    pages = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "url": pa.array(["https://a.example/p", "https://b.example/p"]),
        "html": pa.array([
            b"<html><head></head></html>",
            b'<html><head><link rel="canonical" '
            b'href="https://trap.example/x"></head></html>',
        ], pa.binary()),
    }))
    redirects = rd.from_arrow(pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "ptr": pa.array([0, 0], pa.int64()),  # doc 1 redirects to doc 0
    }))
    out = page_identity(pages, redirects, rounds=2).to_pandas()
    assert sorted(out.cluster.tolist()) == [0, 0]


def test_extract_meta_refresh_variants():
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import extract_meta_refresh

    t = pa.table({
        "url": [f"u{i}" for i in range(7)],
        "html": [
            b'<meta http-equiv="refresh" content="0;url=https://a.example/x">',
            b'<META CONTENT="5; URL = https://b.example/y" HTTP-EQUIV=refresh>',
            b"<meta http-equiv='Refresh' content='0;url=/relative/p'>",
            b'<meta http-equiv="refresh" content="30">',  # no url
            b'<meta name="viewport" content="0;url=https://decoy.example">',
            b"\xff\xfeinvalid utf8 soup",
            b"<body>no meta at all</body>",
        ],
    })
    out = extract_meta_refresh(t).column("refresh_url").to_pylist()
    assert out == [
        "https://a.example/x", "https://b.example/y", "/relative/p",
        None, None, None, None,
    ]


def test_meta_refresh_chains_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import meta_refresh_chains
    from dupers_ray.synth import synth_redirect_pages

    n = 36
    fix = synth_redirect_pages(
        pa.table({"doc_id": pa.array(range(n), pa.int64())}),
        meta_refresh=True)
    pages = rd.from_arrow(fix.select(["doc_id", "url", "html"]))
    out = meta_refresh_chains(pages, rounds=2).to_pandas().sort_values("id")
    assert out.root.tolist() == [i - i % 4 for i in range(n)]
    assert out.hops.tolist() == [i % 4 for i in range(n)]


def test_url_template_folding():
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import canonical_url, url_template

    urls = [
        "https://ex.com/article/12345?b=2&a=1",
        "https://ex.com/article/98765?a=9&b=8",
        "https://ex.com/u/3fa85f6457174562b3fc2c963f66afa6/profile",
        "https://ex.com/2024/01/15/post-title",
        "https://sub9.ex.com/page",          # digits in host stay verbatim
        "https://ex.com/plain",
        "not a url at all",
    ]
    t = canonical_url(pa.table({"url": urls}))
    out = url_template(t).column("url_template").to_pylist()
    assert out[0] == "ex.com/article/{d}?a&b"
    assert out[0] == out[1]                  # same template, any id/values
    assert out[2] == "ex.com/u/{hex}/profile"
    assert out[3] == "ex.com/{d}/{d}/{d}/post-title"
    assert out[4] == "sub9.ex.com/page"
    assert out[5] == "ex.com/plain"
    assert out[6] == "not a url at all"      # non-URL passthrough


def test_template_rollup(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import template_rollup

    urls = [f"https://ex.com/item/{i}" for i in range(7)] + [
        "https://ex.com/about", "https://other.net/item/1",
    ]
    ds = rd.from_arrow(pa.table({"url": urls})).repartition(3)
    got = {r["url_template"]: r["n"] for r in template_rollup(ds).take_all()}
    assert got == {
        "ex.com/item/{d}": 7, "ex.com/about": 1, "other.net/item/{d}": 1,
    }


def test_extract_amphtml_href():
    import pyarrow as pa

    from dupers_ray.stages.urlnorm import extract_amphtml_href

    html = pa.array([
        b'<link rel="amphtml" href="https://a/amp">',
        b"<LINK HREF='https://b/amp' REL=amphtml>",
        b'<link rel="canonical" href="https://c/">',   # wrong rel
        b"no links at all",
    ], pa.binary())
    out = extract_amphtml_href(pa.table({"html": html}))
    assert out.column("amp_href").to_pylist() == [
        "https://a/amp", "https://b/amp", None, None,
    ]


def test_amp_unify_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dupers_ray.pipelines.urls import amp_unify
    from dupers_ray.synth import synth_amp_pages

    n = 48
    pages = rd.from_arrow(
        synth_amp_pages(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    ).repartition(4)
    out = amp_unify(pages).to_pandas().sort_values("doc_id")
    want = [i - i % 3 if i % 3 < 2 else i for i in range(n)]
    assert out.cluster.tolist() == want
