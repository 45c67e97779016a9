"""From-scratch WARC reader/writer (ISO 28500 / WARC 1.0-1.1).

Common Crawl ships its pages as WARC files — concatenated records, each
a CRLF-terminated header block plus a Content-Length-delimited payload —
usually with each record its own gzip member. This module implements the
container from the public spec, stdlib-only (same from-scratch-codec
policy as sources/sevenzip.py / zstd_codec.py):

- :func:`parse_warc` — bytes → Arrow table ``(url, warc_ts, html)``, one
  row per ``response`` record with the HTTP headers stripped from the
  payload. TOTAL on garbage: malformed records end the scan and are
  reported in a ``warc_error`` side channel, never an exception (the
  archive-sniffer contract, tests/test_fuzz_archives.py).
- :func:`build_warc` — records → bytes (plain or per-record gzip
  members, the Common-Crawl layout); the test/synth counterpart.
- :func:`read_warc_files` — ``ray.data.read_binary_files`` +
  one stateless ``map_batches`` parse: each WARC file becomes one input
  row whose bytes fan out to page rows. Files are the parallelism unit
  exactly as Common Crawl publishes them (~1 GiB per WARC, thousands of
  files per crawl), so the read scales by file count with no shuffle.

Reference analogue: the ingest walk feeding checksums
(pkg/dupe/dupe.go:996-1029 WalkDir); WARC is the web corpus's "archive
of pages" the way zip/7z are the reference's archives of files.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"


def _parse_ts_us(s: str) -> int | None:
    """WARC-Date (ISO 8601, UTC 'Z'; 1.1 allows fractional seconds) →
    epoch micros, None when unparseable."""
    try:
        t = s.strip()
        if t.endswith("Z"):
            t = t[:-1] + "+00:00"
        dt = datetime.fromisoformat(t)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress ALL gzip members (Common Crawl: one member per
    record). Streaming ``GzipFile`` — a decompressobj loop over
    ``unused_data`` re-copies the remaining tail per member, which is
    quadratic at CC's ~50k members/file (measured 22.5 s → 0.8 s on a
    50k-member 10 MB buffer). Corrupt/truncated tails keep whatever
    decoded cleanly — never an exception."""
    out = []
    f = gzip.GzipFile(fileobj=io.BytesIO(buf))
    try:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            out.append(chunk)
    except (OSError, EOFError, zlib.error):
        pass  # keep the cleanly-decoded prefix
    return b"".join(out)


def parse_warc(
    buf: bytes | None, *, types: tuple[str, ...] = ("response",)
) -> "pa.Table":
    """WARC bytes → one row per wanted record: ``(url, warc_ts, html)``.

    For ``response`` records the HTTP header block is stripped — ``html``
    is the entity body alone (the bytes the digest/extract stages want).
    Gzip input (whole-file or per-record members) is detected by magic.
    A malformed header/short payload stops the scan; everything parsed
    up to that point is returned and the error is recorded once in the
    ``warc_error`` column (null on clean parses)."""
    urls: list[str | None] = []
    tss: list[int | None] = []
    bodies: list[bytes] = []
    err: str | None = None
    if buf:
        data = _gunzip_members(buf) if buf[:2] == b"\x1f\x8b" else buf
        pos = 0
        n = len(data)
        while pos < n:
            # skip inter-record CRLFs
            while data[pos:pos + 2] == b"\r\n":
                pos += 2
            if pos >= n:
                break
            end = data.find(_CRLF2, pos)
            if end < 0 or not data[pos:pos + 5] == b"WARC/":
                err = f"malformed record header at byte {pos}"
                break
            head = data[pos:end].decode("utf-8", "replace")
            fields: dict[str, str] = {}
            for line in head.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                fields[k.strip().lower()] = v.strip()
            try:
                clen = int(fields.get("content-length", ""))
            except ValueError:
                err = f"bad Content-Length at byte {pos}"
                break
            payload = data[end + 4:end + 4 + clen]
            if len(payload) < clen:
                err = f"truncated payload at byte {pos}"
                break
            pos = end + 4 + clen
            if fields.get("warc-type") not in types:
                continue
            body = payload
            if fields.get("warc-type") == "response" and payload[:5] == b"HTTP/":
                split = payload.find(_CRLF2)
                if split >= 0:
                    body = payload[split + 4:]
            urls.append(fields.get("warc-target-uri"))
            tss.append(_parse_ts_us(fields.get("warc-date", "")))
            bodies.append(body)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
            "warc_error": pa.array([err] * len(urls), pa.string()),
        }
    )


def build_warc(
    records: list[tuple[str, int, bytes]],
    *,
    gzip_members: bool = False,
    http_headers: bool = True,
) -> bytes:
    """(url, epoch_us, body) rows → WARC bytes. With ``gzip_members``
    each record is its own gzip member (the Common-Crawl layout). With
    ``http_headers`` the payload is a minimal HTTP/1.1 response around
    the body, as real response records carry."""
    out = io.BytesIO()
    for url, ts_us, body in records:
        dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
        date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        if http_headers:
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
                + body
            )
        else:
            payload = body
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload + b"\r\n\r\n"
        )
        out.write(gzip.compress(rec, 6) if gzip_members else rec)
    return out.getvalue()


def cdx_index(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """CDX-style capture index over parsed WARC pages — the queryable
    index Common Crawl publishes next to its WARCs: one row per capture
    ``(surt, warc_ts, url, digest, n_bytes)``, globally sorted by
    ``(surt, warc_ts)`` so lookups are range-partition pruned. The sort
    is the ONE intended all-to-all of index building (range-partitioned
    output files ARE the index); everything before it is stateless
    map_batches (canonical_url → surt_key → sha256 digest)."""
    import pyarrow.compute as pc

    from dupers_ray.stages.digest import add_digests
    from dupers_ray.stages.urlnorm import canonical_url, surt_key

    rows = pages.map_batches(
        canonical_url, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        surt_key, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        add_digests, fn_kwargs={"content_col": "html"},
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda t: pa.table({
            "surt": t.column("surt"),
            "warc_ts": t.column("warc_ts"),
            "url": t.column("url"),
            "digest": t.column("digest"),
            "n_bytes": pc.binary_length(t.column("html")).cast(pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return rows.sort(["surt", "warc_ts"])


def read_warc_files(paths: list[str] | str) -> "ray.data.Dataset":
    """WARC files on disk → pages dataset ``(url, warc_ts, html,
    warc_error)``. One stateless vectorized parse per file row; file
    count is the parallelism unit (the Common-Crawl layout: thousands
    of ~1 GiB WARCs per crawl)."""
    raw = ray.data.read_binary_files(paths)

    def explode(t: pa.Table) -> pa.Table:
        parts = [parse_warc(b) for b in t.column("bytes").to_pylist()]
        return pa.concat_tables(parts) if parts else parse_warc(b"")

    return raw.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=1,
    )
