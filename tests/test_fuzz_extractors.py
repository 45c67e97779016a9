"""Adversarial-input robustness for the vectorized HTML/XML/robots
extractors — same contract as the archive fuzz suite (the reference
fuzzes its parsers; these kernels eat raw crawl bytes at scale, so
totality is a correctness property, not a nicety):

- every batch kernel is TOTAL over arbitrary bytes: no exception, a
  well-formed output table with the documented schema;
- outputs only ever reference input rows (parent indices in range);
- planted well-formed fragments are still recovered when surrounded
  by arbitrary junk (no catastrophic bailout).
"""
from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dupers_ray.stages.sitemap import (
    robots_sitemaps_batch,
    sitemap_entries_batch,
)
from dupers_ray.stages.urlnorm import (
    extract_canonical_href,
    extract_meta_refresh,
)

_BYTES = st.binary(max_size=400)


def _table(blobs: list[bytes], extra_url: bool = False) -> pa.Table:
    cols = {
        "host_id": pa.array(range(len(blobs)), pa.int64()),
        "html": pa.array(blobs, pa.binary()),
    }
    if extra_url:
        cols["url"] = pa.array(
            [f"https://h{i}.example/p" for i in range(len(blobs))],
            pa.string())
    return pa.table(cols)


@settings(max_examples=200, deadline=None)
@given(blobs=st.lists(_BYTES, max_size=8))
def test_sitemap_entries_total(blobs):
    out = sitemap_entries_batch(_table(blobs))
    assert out.column_names == ["host_id", "loc", "lastmod"]
    ids = out.column("host_id").to_pylist()
    assert all(0 <= i < len(blobs) for i in ids)


@settings(max_examples=200, deadline=None)
@given(blobs=st.lists(_BYTES, max_size=8))
def test_robots_sitemaps_total(blobs):
    t = pa.table({
        "host_id": pa.array(range(len(blobs)), pa.int64()),
        "body": pa.array(blobs, pa.binary()),
    })
    out = robots_sitemaps_batch(t)
    assert out.column_names == ["host_id", "sitemap_url"]
    assert all(0 <= i < len(blobs)
               for i in out.column("host_id").to_pylist())


@settings(max_examples=200, deadline=None)
@given(blobs=st.lists(_BYTES, max_size=8))
def test_meta_refresh_total(blobs):
    t = _table(blobs, extra_url=True)
    out = extract_meta_refresh(t)
    assert out.num_rows == len(blobs)  # per-row transform, no drops


@settings(max_examples=200, deadline=None)
@given(blobs=st.lists(_BYTES, max_size=8))
def test_canonical_href_total(blobs):
    t = _table(blobs, extra_url=True)
    out = extract_canonical_href(t)
    assert out.num_rows == len(blobs)


@settings(max_examples=100, deadline=None)
@given(junk_a=_BYTES, junk_b=_BYTES)
def test_planted_entry_survives_junk(junk_a, junk_b):
    """A well-formed <url> entry embedded in arbitrary junk is still
    extracted (as long as the junk can't open/close entries itself)."""
    junk_a = junk_a.replace(b"<url>", b"").replace(b"<loc>", b"")
    junk_b = junk_b.replace(b"<url>", b"").replace(b"<loc>", b"")
    blob = (junk_a
            + b"<url><loc>https://x.example/ok</loc></url>" + junk_b)
    out = sitemap_entries_batch(_table([blob]))
    assert "https://x.example/ok" in out.column("loc").to_pylist()
