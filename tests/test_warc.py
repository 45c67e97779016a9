"""From-scratch WARC reader (sources/warc.py, ISO 28500): build↔parse
round trip (plain + per-record gzip members), HTTP header stripping,
record-type filtering, totality on garbage, Ray file ingest."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from dupers_ray.sources.warc import build_warc, parse_warc, read_warc_files

RECS = [
    ("https://a.example/p1", 1_700_000_000_000_000, b"<p>one</p>"),
    ("https://b.example/p2", 1_700_000_001_000_000, b"<p>two</p>"),
    ("https://c.example/p3", 1_700_000_002_500_000, b""),  # empty body
]


def _check(t: pa.Table):
    assert t.column("url").to_pylist() == [u for u, _, _ in RECS]
    # WARC-Date has second resolution — micros truncate on round trip
    assert t.column("warc_ts").cast(pa.int64()).to_pylist() == [
        ts - ts % 1_000_000 for _, ts, _ in RECS
    ]
    assert t.column("html").to_pylist() == [b for _, _, b in RECS]
    assert t.column("warc_error").to_pylist() == [None] * len(RECS)


def test_round_trip_plain_and_gzip():
    _check(parse_warc(build_warc(RECS)))
    _check(parse_warc(build_warc(RECS, gzip_members=True)))
    # whole-buffer gzip (a .warc.gz compressed as one member)
    import gzip

    _check(parse_warc(gzip.compress(build_warc(RECS))))


def test_http_headers_stripped_and_optional():
    t = parse_warc(build_warc(RECS[:1]))
    assert t.column("html").to_pylist() == [b"<p>one</p>"]  # no HTTP/1.1
    t2 = parse_warc(build_warc(RECS[:1], http_headers=False))
    assert t2.column("html").to_pylist() == [b"<p>one</p>"]


def test_non_response_records_skipped():
    buf = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"meta\r\n\r\n" + build_warc(RECS[:1])
    )
    t = parse_warc(buf)
    assert len(t) == 1 and t.column("url")[0].as_py() == RECS[0][0]


def test_total_on_garbage_and_truncation():
    rng = np.random.default_rng(11)
    for blob in [
        b"", None, b"not a warc", bytes(rng.integers(0, 256, 300)),
        build_warc(RECS)[:40],          # truncated mid-header
        build_warc(RECS)[:-12],         # truncated mid-payload tail
        b"WARC/1.0\r\nContent-Length: zz\r\n\r\n",  # bad length
        b"\x1f\x8b" + bytes(rng.integers(0, 256, 50)),  # gzip garbage
    ]:
        t = parse_warc(blob)  # must not raise
        assert "warc_error" in t.column_names
    # truncated tail: first records still come back, error recorded
    t = parse_warc(build_warc(RECS)[:-12])
    assert len(t) == 2
    assert t.column("warc_error").to_pylist()[0].startswith("truncated")


def test_read_warc_files_ingest(tmp_path):
    p1, p2 = tmp_path / "a.warc", tmp_path / "b.warc.gz"
    p1.write_bytes(build_warc(RECS[:2]))
    p2.write_bytes(build_warc(RECS[2:], gzip_members=True))
    ds = read_warc_files([str(p1), str(p2)])
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [u for u, _, _ in RECS]
    assert rows[0]["html"] == b"<p>one</p>"


def test_cdx_index_sorted_and_complete():
    import ray.data as rd

    from dupers_ray.sources.warc import cdx_index

    t = pa.table({
        "url": ["https://b.example/x", "https://a.example/y",
                "https://a.example/y"],
        "warc_ts": pa.array(
            [2_000_000, 1_000_000, 3_000_000], pa.timestamp("us")
        ),
        "html": pa.array([b"bb", b"aa", b"aa2"], pa.binary()),
    })
    rows = cdx_index(rd.from_arrow(t).repartition(2)).take_all()
    keys = [(r["surt"], r["warc_ts"]) for r in rows]
    assert keys == sorted(keys)  # globally (surt, ts) sorted
    assert [r["surt"] for r in rows] == [
        "example,a)/y", "example,a)/y", "example,b)/x"
    ]
    assert rows[0]["n_bytes"] == 2 and rows[2]["url"] == "https://b.example/x"
    import hashlib

    assert rows[2]["digest"] == hashlib.sha256(b"bb").hexdigest()


def test_warc_framing_property():
    """Content-Length framing must round-trip ADVERSARIAL bodies —
    including bodies containing CRLFCRLF, 'WARC/' magic, or an HTTP/
    prefix — because the parser counts bytes, never scans for
    delimiters inside payloads."""
    from hypothesis import given, settings, strategies as st

    body = st.binary(min_size=0, max_size=200)
    url_part = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-._~/", min_size=1,
        max_size=30,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(url_part, body), min_size=1, max_size=5))
    def check(items):
        recs = [
            (f"https://x.example/{u}",
             1_700_000_000_000_000 + k * 1_000_000,
             b"\r\n\r\nWARC/1.0\r\n" + b + b"HTTP/1.1")
            for k, (u, b) in enumerate(items)
        ]
        for gz in (False, True):
            t = parse_warc(build_warc(recs, gzip_members=gz))
            assert t.column("warc_error").to_pylist() == [None] * len(recs)
            assert t.column("html").to_pylist() == [r[2] for r in recs]
            assert t.column("url").to_pylist() == [r[0] for r in recs]

    check()
