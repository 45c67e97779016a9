"""Web link-graph extraction + integer fixed-point PageRank.

The link-analysis leg a web-corpus engine needs next to dedup: pull
``<a href>`` targets out of the raw ``html`` column, roll them up to a
host-level edge list, and rank hosts with a fixed number of power
iterations (Page et al. 1999). Everything is integer fixed-point
(rank in parts-per-million, damping 85/100, floor division) so the
driver oracle hash-compares exactly — the gopher_rules / dsir idiom.

Scale shape:
- ``extract_links`` is ONE stateless vectorized pass: Arrow
  ``split_pattern`` on ``href="`` fans each page out to its link
  pieces (offsets arithmetic, no Python per row), a second
  ``split_pattern(max_splits=1)`` + ``list_element`` closes the quote,
  and ``extract_regex`` keeps the https host. Malformed/relative
  hrefs drop out as nulls — counted, not crashed.
- Host edges pre-aggregate inside the batch (src, dst, weight) before
  any shuffle, so boilerplate nav-bars collapse early.
- ``pagerank`` keeps the rank vector as a broadcast object (one
  ``ray.put`` per iteration, read once per task — the standard
  "rank vector fits in aggregate memory" regime: ~10^8 hosts x 16 B;
  per-edge contributions stream through ONE groupby-sum per
  iteration, never materializing the edge list on the driver). For a
  rank vector beyond memory, swap the broadcast for the cogroup join
  in pipelines/joins.py — the contribution/groupby shape is unchanged.

Reference analogue: none (dupers has no link surface) — engine-new,
like the quality/dedup-cascade stack.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

PPM = 1_000_000
DAMPING_NUM = 85
DAMPING_DEN = 100


def links_batch(
    t: pa.Table,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    host_col: str = "src_host",
) -> pa.Table:
    """The per-batch kernel of :func:`extract_links` (module-level so
    the fuzz tests can drive it without a Ray dataset). Total on ANY
    input bytes: non-UTF-8 html decodes lossily (U+FFFD), malformed
    hrefs drop to zero rows."""
    import pyarrow.compute as pc

    html = t.column(html_col)
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        try:
            html = pc.cast(html, pa.string())
        except pa.ArrowInvalid:
            # rare path: garbage bytes in a crawl — decode lossily
            html = pa.array(
                [None if v is None else v.decode("utf-8", "replace")
                 for v in html.to_pylist()],
                pa.string(),
            )
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    pieces = pc.split_pattern(html, 'href="')
    flat = pc.list_flatten(pieces)
    parent = pc.list_parent_indices(pieces).to_numpy(zero_copy_only=False)
    # piece 0 of each list is pre-href prose; mask it via offsets
    nlinks = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
    starts = np.repeat(np.cumsum(nlinks) - nlinks, nlinks)
    pos = np.arange(len(flat), dtype=np.int64) - starts
    keep = pos > 0
    flat = flat.filter(pa.array(keep))
    parent = parent[keep]
    # close the quote, keep the https host
    url = pc.list_element(
        pc.split_pattern(flat, '"', max_splits=1), 0
    )
    host = pc.struct_field(
        pc.extract_regex(url, r'^https://(?P<host>[^/"]+)'), "host"
    )
    ok = pc.is_valid(host).to_numpy(zero_copy_only=False)
    idx = pa.array(parent[ok])
    return pa.table({
        id_col: t.column(id_col).take(idx),
        "src_host": t.column(host_col).take(idx),
        "dst_host": host.filter(pa.array(ok)),
    })


def extract_links(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    host_col: str = "src_host",
) -> "ray.data.Dataset":
    """(id, src_host, dst_host) — one row per https link; the page's own
    host comes from its self-identifying ``host_col``. Pages with no
    links contribute no rows here (pagerank adds the base mass to every
    node, linked-to or not). ONE stateless vectorized pass
    (:func:`links_batch`)."""
    import functools

    return ds.map_batches(
        functools.partial(
            links_batch, id_col=id_col, html_col=html_col, host_col=host_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pagerank(
    edges: "ray.data.Dataset",
    *,
    iters: int = 2,
    base: int = PPM,
    broadcast_limit: int = 50_000_000,
) -> pa.Table:
    """(host, pr_ppm) after ``iters`` integer power iterations over the
    (src_host, dst_host) edge dataset. Fixed-point contract (the SQL
    oracle restates it verbatim):

        r0[v]   = 1_000_000
        r_k+1[v] = 150_000 + sum over edges (u, v) of
                   (85 * r_k[u]) // (100 * outdeg[u])

    Nodes = union of src and dst hosts; every node keeps the 150_000
    base even with no in-links. Rank vector + outdeg are broadcast
    (asserted under ``broadcast_limit`` entries); contributions stream
    through one groupby-sum per iteration."""
    from ray.data.aggregate import Sum

    edges = edges.materialize()  # consumed iters+2 times

    def uniq_hosts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(
            pa.chunked_array([
                t.column("src_host").combine_chunks(),
                t.column("dst_host").combine_chunks(),
            ])
        )
        return pa.table({"host": u})

    hosts_rows = (
        edges.map_batches(uniq_hosts, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("host").count().take_all()
    )
    hosts = np.sort(np.array([r["host"] for r in hosts_rows]))
    n_hosts = len(hosts)
    if n_hosts > broadcast_limit:
        raise ValueError(
            f"pagerank rank vector ({n_hosts} hosts) exceeds "
            f"broadcast_limit; use the cogroup-join variant"
        )

    deg_rows = (
        edges.groupby("src_host").count().take_all()
    )
    outdeg = np.ones(n_hosts, np.int64)  # nodes w/o out-links never contribute
    if deg_rows:
        dsrc = np.array([r["src_host"] for r in deg_rows])
        dcnt = np.array([r["count()"] for r in deg_rows], np.int64)
        outdeg[np.searchsorted(hosts, dsrc)] = dcnt

    hosts_ref = ray.put(hosts)
    deg_ref = ray.put(outdeg)
    r = np.full(n_hosts, base, np.int64)

    for _ in range(iters):
        r_ref = ray.put(r)

        def contribs(t: pa.Table) -> pa.Table:
            h = ray.get(hosts_ref)
            d = ray.get(deg_ref)
            rv = ray.get(r_ref)
            src = np.asarray(t.column("src_host"))
            dst = t.column("dst_host")
            si = np.searchsorted(h, src)
            c = (DAMPING_NUM * rv[si]) // (DAMPING_DEN * d[si])
            return pa.table({
                "dst_host": dst,
                "contrib": pa.array(c.astype(np.int64)),
            })

        agg = (
            edges.map_batches(contribs, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("dst_host")
            .aggregate(Sum("contrib", alias_name="contrib"))
            .take_all()
        )
        r = np.full(n_hosts, (DAMPING_DEN - DAMPING_NUM) * base // DAMPING_DEN,
                    np.int64)
        if agg:
            ai = np.searchsorted(hosts, np.array([x["dst_host"] for x in agg]))
            r[ai] += np.array([x["contrib"] for x in agg], np.int64)

    return pa.table({
        "host": pa.array(hosts),
        "pr_ppm": pa.array(r),
    })


def hits(
    edges: "ray.data.Dataset",
    *,
    base: int = PPM,
    broadcast_limit: int = 50_000_000,
) -> pa.Table:
    """(host, auth_ppm, hub_ppm) — one integer HITS round (Kleinberg
    1999) with fixed-point max-normalization so values stay bounded at
    any corpus size. Contract (the SQL oracle restates it verbatim):

        h0[u]       = 1_000_000
        a1[v]       = sum over edges (u, v) of h0[u]
        auth_ppm[v] = (a1[v] * 1_000_000) // max(a1)
        h1[u]       = sum over edges (u, v) of auth_ppm[v]
        hub_ppm[u]  = (h1[u] * 1_000_000) // max(h1)

    Hosts receiving/sending no links score 0 on that side. Same
    distributed shape as :func:`pagerank`: contributions stream through
    one groupby-sum per half-step, the score vector broadcasts."""
    from ray.data.aggregate import Sum

    edges = edges.materialize()  # consumed 3 times

    def uniq_hosts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(
            pa.chunked_array([
                t.column("src_host").combine_chunks(),
                t.column("dst_host").combine_chunks(),
            ])
        )
        return pa.table({"host": u})

    hosts_rows = (
        edges.map_batches(uniq_hosts, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("host").count().take_all()
    )
    hosts = np.sort(np.array([r["host"] for r in hosts_rows]))
    n_hosts = len(hosts)
    if n_hosts > broadcast_limit:
        raise ValueError(
            f"hits score vector ({n_hosts} hosts) exceeds broadcast_limit"
        )

    # a1[v] = indeg(v) * base (h0 is uniform): one groupby count
    indeg_rows = edges.groupby("dst_host").count().take_all()
    a1 = np.zeros(n_hosts, np.int64)
    if indeg_rows:
        di = np.searchsorted(hosts, np.array([r["dst_host"] for r in indeg_rows]))
        a1[di] = np.array([r["count()"] for r in indeg_rows], np.int64) * base
    auth = (a1 * PPM) // max(int(a1.max()), 1)

    hosts_ref = ray.put(hosts)
    auth_ref = ray.put(auth)

    def hub_contribs(t: pa.Table) -> pa.Table:
        h = ray.get(hosts_ref)
        a = ray.get(auth_ref)
        dst = np.asarray(t.column("dst_host"))
        return pa.table({
            "src_host": t.column("src_host"),
            "contrib": pa.array(a[np.searchsorted(h, dst)].astype(np.int64)),
        })

    agg = (
        edges.map_batches(hub_contribs, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("src_host")
        .aggregate(Sum("contrib", alias_name="contrib"))
        .take_all()
    )
    h1 = np.zeros(n_hosts, np.int64)
    if agg:
        si = np.searchsorted(hosts, np.array([x["src_host"] for x in agg]))
        h1[si] = np.array([x["contrib"] for x in agg], np.int64)
    hub = (h1 * PPM) // max(int(h1.max()), 1)

    return pa.table({
        "host": pa.array(hosts),
        "auth_ppm": pa.array(auth),
        "hub_ppm": pa.array(hub),
    })
