"""URL canonicalization for web-scale URL-level dedup.

The reference dedups file paths after normalizing them (clean/abs in
``pkg/dupe/dupe.go:519-530``, case-folded compares in ``dupe.go:1001-1013``);
the web-corpus analogue is URL canonicalization: the same page is crawled
as ``http://WWW.Site.com/a/?utm_source=feed#top`` and
``https://www.site.com/a``, and URL-level dedup only works on a canonical
form. This stage implements the standard normalization (RFC 3986 §6 plus
the usual crawler extensions) with pure Arrow RE2 kernels and one
numpy stable-sort for query-parameter reordering — no Python per row.

Canonical contract (each step SQL-restatable, value-oracled by the driver):
  1. trim ASCII whitespace; strip the fragment (``#...``).
  2. rows not shaped ``scheme://authority...`` pass through unchanged
     (they are not URLs; dedup still sees a deterministic value).
  3. lowercase scheme and authority (host compare is case-insensitive).
  4. drop the scheme's default port (``http…:80``, ``https…:443``).
  5. collapse trailing ``/`` runs in the path; empty path becomes ``/``.
  6. query string: split on ``&``, drop empty params and tracking params
     (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``), sort the rest
     bytewise, rejoin; an emptied query drops its ``?``.

Idempotent: canonical(canonical(u)) == canonical(u) (property-tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tracking params dropped by step 6.  A param token matches key-only
# ("utm_x") and key=value ("utm_x=1") forms.
TRACKING_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid)(=.*)?$"

_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?]*)(?P<path>[^?]*)$"


def _sort_join_params(q: pa.Array) -> pa.Array:
    """Per-row: split '&', drop empty/tracking tokens, bytewise-sort,
    rejoin.  Null in → null out.  Vectorized: one flatten, two numpy
    stable argsorts (token then row — a lexsort), one list rebuild."""
    toks = pc.split_pattern(q, pattern="&")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    n = len(toks)
    lens = np.asarray(pc.list_value_length(toks).fill_null(0))
    row = np.repeat(np.arange(n, dtype=np.int64), lens)

    keep = pc.and_(
        pc.invert(pc.match_substring_regex(flat, TRACKING_RE)),
        pc.not_equal(flat, ""),
    )
    keep_np = np.asarray(keep.fill_null(False))
    row = row[keep_np]
    kept = flat.filter(pa.array(keep_np))

    # stable sort by token, then stable sort by row ⇒ rows ascending,
    # tokens bytewise-ascending within each row
    tok_np = np.asarray(kept.to_numpy(zero_copy_only=False), dtype=object)
    order = np.argsort(tok_np, kind="stable") if len(tok_np) else np.empty(0, np.int64)
    order = order[np.argsort(row[order], kind="stable")] if len(order) else order

    counts = np.bincount(row, minlength=n) if len(row) else np.zeros(n, np.int64)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    rebuilt = pa.ListArray.from_arrays(
        pa.array(offsets), kept.take(pa.array(order, type=pa.int64()))
    )
    joined = pc.binary_join(rebuilt, "&")
    # null query rows must stay null (no '?' in the source URL)
    return pc.if_else(pc.is_null(q), pa.scalar(None, pa.string()), joined)


def canonical_url(
    batch: pa.Table, *, url_col: str = "url", out_col: str = "url_canon",
) -> pa.Table:
    u = pc.replace_substring_regex(
        batch.column(url_col), pattern=r"#.*$", replacement=""
    )
    u = pc.utf8_trim_whitespace(u)

    # query = text after the first '?' (null when absent); head = the rest
    qm = pc.extract_regex(u, pattern=r"^[^?]*\?(?P<q>.*)$")
    q = _sort_join_params(pc.struct_field(qm, "q"))
    head = pc.replace_substring_regex(u, pattern=r"\?.*$", replacement="")

    m = pc.extract_regex(head, pattern=_URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(m, "auth"))
    path = pc.struct_field(m, "path")

    auth = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(auth, pattern=r":80$", replacement=""),
        auth,
    )
    auth = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(auth, pattern=r":443$", replacement=""),
        auth,
    )

    path = pc.replace_substring_regex(path, pattern=r"/+$", replacement="")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    # a query emptied by filtering (or absent) contributes nothing — the
    # '?' is dropped with it
    q_absent = pc.or_kleene(pc.is_null(q), pc.equal(q, ""))
    qtail = pc.if_else(
        q_absent, pa.scalar("", pa.string()),
        pc.binary_join_element_wise(pa.scalar("?"), q.cast(pa.string()), ""),
    )
    canon = pc.binary_join_element_wise(scheme, "://", auth, path, qtail, "")
    # non-URL rows (regex miss ⇒ null struct fields) pass through trimmed
    canon = pc.if_else(pc.is_null(canon), u, canon)

    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col), out_col, canon)
    return batch.append_column(out_col, canon)


def url_template(
    batch: pa.Table, *, url_col: str = "url_canon", out_col: str = "url_template",
) -> pa.Table:
    """Structural URL template: host + path with long hex runs (>= 16
    chars: uuids/hashes) folded to ``{hex}`` and digit runs to ``{d}``,
    plus the sorted query-param NAMES (values stripped). URL-pattern
    mining is the standard crawl-frontier / URL-spam signal: a host
    whose pages collapse to one template with a counter is a calendar,
    faceted-search or session-id trap (analogue of the reference's
    filename-pattern buckets). Pure Arrow RE2 — stateless, no shuffle.
    Expects canonical URLs (canonical_url) so param order is stable;
    rows that don't parse as URLs pass through verbatim."""
    u = batch.column(url_col)
    head = pc.replace_substring_regex(u, pattern=r"\?.*$", replacement="")
    qm = pc.extract_regex(u, pattern=r"^[^?]*\?(?P<q>.*)$")
    names = pc.replace_substring_regex(
        pc.struct_field(qm, "q"), pattern=r"=[^&]*", replacement=""
    )
    m = pc.extract_regex(head, pattern=_URL_RE)
    auth = pc.utf8_lower(pc.struct_field(m, "auth"))
    tpath = pc.replace_substring_regex(
        pc.struct_field(m, "path"), pattern=r"[0-9a-fA-F]{16,}",
        replacement="{hex}",
    )
    tpath = pc.replace_substring_regex(
        tpath, pattern=r"[0-9]+", replacement="{d}"
    )
    no_names = pc.or_kleene(pc.is_null(names), pc.equal(names, ""))
    qtail = pc.if_else(
        no_names, pa.scalar("", pa.string()),
        pc.binary_join_element_wise(
            pa.scalar("?"), names.cast(pa.string()), ""
        ),
    )
    tmpl = pc.binary_join_element_wise(auth, tpath, qtail, "")
    tmpl = pc.if_else(pc.is_null(tmpl), u, tmpl)
    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col), out_col, tmpl)
    return batch.append_column(out_col, tmpl)


def extract_canonical_href(
    batch: pa.Table,
    *,
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "canonical",
) -> pa.Table:
    """``<link rel="canonical" href=…>`` honoring — the page's OWN
    declaration of its canonical identity, which crawl dedup must
    respect before any content hashing (SEO mirrors/trackers point
    thousands of variants at one canonical). ONE vectorized RE2 match
    over raw html bytes (attr order/quote/case tolerant both ways,
    invalid-UTF-8 safe); pages without a declaration fall back to their
    own ``url_col``."""
    pat = (
        r'(?is)<link\s+[^>]*'
        r'(?:rel\s*=\s*["\x27]?canonical["\x27]?[^>]*'
        r'href\s*=\s*["\x27](?P<a>[^"\x27]+)'
        r'|href\s*=\s*["\x27](?P<b>[^"\x27]+)["\x27][^>]*'
        r'rel\s*=\s*["\x27]?canonical)'
    )
    m = pc.extract_regex(batch.column(html_col), pat)
    a, b = pc.struct_field(m, "a"), pc.struct_field(m, "b")
    # a non-participating alternation branch extracts as "" (not null) —
    # the href patterns are [^"']+ so a real match is never empty
    href = pc.if_else(
        pc.not_equal(pc.fill_null(a, ""), ""), a, b
    )
    if pa.types.is_binary(href.type) or pa.types.is_large_binary(href.type):
        href = pc.cast(href, pa.string())
    canon = pc.if_else(pc.is_null(href), batch.column(url_col), href)
    return batch.append_column(out_col, canon)


def extract_amphtml_href(
    batch: pa.Table,
    *,
    html_col: str = "html",
    out_col: str = "amp_href",
) -> pa.Table:
    """``<link rel="amphtml" href=…>`` — the canonical page's OWN pointer
    at its AMP mirror. The reverse direction of rel=canonical: AMP pages
    SHOULD declare canonical back, but misconfigured ones often don't,
    and then this forward edge is the only signal that the /amp URL is a
    duplicate identity. Same tolerant RE2 as extract_canonical_href;
    NULL when the page declares no AMP variant (no self fallback — the
    absence is the signal)."""
    pat = (
        r'(?is)<link\s+[^>]*'
        r'(?:rel\s*=\s*["\x27]?amphtml["\x27]?[^>]*'
        r'href\s*=\s*["\x27](?P<a>[^"\x27]+)'
        r'|href\s*=\s*["\x27](?P<b>[^"\x27]+)["\x27][^>]*'
        r'rel\s*=\s*["\x27]?amphtml)'
    )
    m = pc.extract_regex(batch.column(html_col), pat)
    a, b = pc.struct_field(m, "a"), pc.struct_field(m, "b")
    href = pc.if_else(pc.not_equal(pc.fill_null(a, ""), ""), a, b)
    if pa.types.is_binary(href.type) or pa.types.is_large_binary(href.type):
        href = pc.cast(href, pa.string())
    return batch.append_column(out_col, href)


def extract_meta_refresh(
    batch: pa.Table,
    *,
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "refresh_url",
) -> pa.Table:
    """``<meta http-equiv="refresh" content="N;url=…">`` extraction —
    the HTML-level redirect crawlers must honor when no HTTP Location
    header exists (doorway pages, parked domains, legacy moved-pages).
    ONE vectorized RE2 match over raw html bytes (attr order tolerant:
    content may precede http-equiv; quote/case/whitespace tolerant;
    bare ``content="0"`` without a url is NOT a redirect).  Pages
    without a refresh get NULL — callers build (id, ptr) pointer edges
    for :func:`dupers_ray.stages.chains.resolve_pointers` with
    ptr = self where null."""
    pat = (
        r'(?is)<meta\s+[^>]*'
        r'(?:http-equiv\s*=\s*["\x27]?refresh["\x27]?[^>]*'
        r'content\s*=\s*["\x27]?\s*\d+\s*;\s*url\s*=\s*'
        r"(?P<a>[^\"\x27>;\s]+)"
        r'|content\s*=\s*["\x27]?\s*\d+\s*;\s*url\s*=\s*'
        r"(?P<b>[^\"\x27>;\s]+)"
        r'[^>]*http-equiv\s*=\s*["\x27]?refresh["\x27]?)'
    )
    m = pc.extract_regex(batch.column(html_col), pat)
    a = pc.struct_field(m, "a")
    b = pc.struct_field(m, "b")
    # alternation: the NON-participating group extracts "" (not null) —
    # pick the non-empty branch (see extract_canonical_href)
    url = pc.if_else(
        pc.equal(pc.fill_null(a, ""), ""), b, a)
    if pa.types.is_binary(url.type) or pa.types.is_large_binary(url.type):
        url = pc.cast(url, pa.string())
    url = pc.if_else(pc.equal(pc.fill_null(url, ""), ""),
                     pa.scalar(None, pa.string()), url)
    return batch.append_column(out_col, url)


def surt_key(
    batch: pa.Table, *, url_col: str = "url_canon", out_col: str = "surt",
) -> pa.Table:
    """SURT — Sort-friendly URI Reordering Transform, the key format web
    archives and Common Crawl's CDX indexes use (public openwayback
    spec): reverse the host labels comma-joined, ``)``, then the path +
    query. ``www.``-prefix and port are dropped (the standard SURT
    canonicalization options), so ``https://www.a.b.example/p?q=1`` →
    ``example,b,a)/p?q=1``. Expects a CANONICAL url column
    (:func:`canonical_url`: lowercase, sorted params).

    Vectorized: ONE split + a numpy within-list reversal permutation on
    the flattened labels (2*start + len - 1 - i) + one list join — no
    per-row Python. Non-URL rows yield null."""
    import numpy as np

    m = pc.extract_regex(
        batch.column(url_col),
        pattern=r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<auth>[^/?]*)"
                r"(?P<rest>.*)$",
    )
    auth = pc.struct_field(m, "auth")
    rest = pc.struct_field(m, "rest")
    host = pc.replace_substring_regex(auth, pattern=r":\d+$", replacement="")
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")

    parts = pc.split_pattern(pc.fill_null(host, ""), ".")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    lens = lens.astype(np.int64)
    starts = np.cumsum(lens) - lens
    starts_r = np.repeat(starts, lens)
    lens_r = np.repeat(lens, lens)
    idx = np.arange(int(lens.sum()), dtype=np.int64)
    perm = 2 * starts_r + lens_r - 1 - idx
    rev = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(lens)]), pa.int32()),
        flat.take(pa.array(perm)),
    )
    rev_host = pc.binary_join(rev, ",")
    surt = pc.binary_join_element_wise(
        rev_host, ")", pc.fill_null(rest, ""), ""
    )
    surt = pc.if_else(pc.is_null(auth), pa.scalar(None, pa.string()), surt)
    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col), out_col, surt)
    return batch.append_column(out_col, surt)


def registrable_domain(
    batch: pa.Table, *, url_col: str = "url_canon", out_col: str = "domain",
) -> pa.Table:
    """Last two host labels (``a.b.example.com`` → ``example.com``) — the
    public-suffix-list-free approximation; single-label hosts pass through.
    Expects a canonical (lowercased) URL column; null for non-URL rows."""
    m = pc.extract_regex(
        batch.column(url_col),
        pattern=r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?#]*)",
    )
    host = pc.replace_substring_regex(
        pc.struct_field(m, "auth"), pattern=r":\d+$", replacement=""
    )
    dm = pc.extract_regex(host, pattern=r"(?P<d>[^.]+\.[^.]+)$")
    dom = pc.if_else(
        pc.is_null(pc.struct_field(dm, "d")), host, pc.struct_field(dm, "d")
    )
    if out_col in batch.column_names:
        return batch.set_column(batch.column_names.index(out_col), out_col, dom)
    return batch.append_column(out_col, dom)
