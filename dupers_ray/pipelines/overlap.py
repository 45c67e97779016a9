"""Cross-source duplicate overlap matrix: for every (source_a, source_b)
pair, how many exact-duplicate DOC PAIRS span them.

The reference reports duplicates as a flat listing (print-join,
pkg/dupe/dupe.go:919-931); at web scale the first question about a crawl
is *which feeds duplicate which* — a sources x sources matrix driving
crawl scheduling / source pruning. Engine-new rollup over the same
digest machinery as exact dedup (stages/digest).

Scale shape: per-batch (digest, source, n) combiner rows → ONE
groupby(digest-hash partition) of count rows (vocabulary-of-digests
sized, never the corpus) → per-PARTITION vectorized segment pair
expansion (sorted (digest, source) runs + triangular index arithmetic —
no per-distinct-digest Python call, the failure mode exact_dedup.py's
header rules out) → tiny final groupby((source_a, source_b)).sum.
Pair math: within one source C(n,2), across two sources n_a * n_b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dupers_ray.stages.digest import add_digests, drop_empty

_PARTITIONS = 256


def _pair_rows(df: pd.DataFrame, group_col: str,
               key_col: str = "digest") -> pd.DataFrame:
    """All (i <= j) source pairs per key segment, vectorized.
    ``df`` holds fully-combined (key, source, n) rows; rows are sorted
    by (key, source) so emitted pairs satisfy source_a <= source_b
    (lexicographic — the SQL oracle's comparison)."""
    if not len(df):
        return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                             "source_b": pd.Series([], dtype=object),
                             "n_pairs": pd.Series([], dtype="int64")})
    dg = df[key_col].to_numpy()
    src = df[group_col].to_numpy()
    cnt = df["n"].to_numpy(dtype=np.int64)
    m = len(dg)
    new = np.r_[True, dg[1:] != dg[:-1]]
    seg = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, m])
    rank = np.arange(m) - starts[seg]
    per_row = sizes[seg] - rank  # pairs where this row is the lower side (incl self)
    total = int(per_row.sum())
    left = np.repeat(np.arange(m), per_row)
    csum = np.r_[0, np.cumsum(per_row)]
    right = np.arange(total) - csum[left] + left
    n = np.where(left == right,
                 cnt[left] * (cnt[left] - 1) // 2,
                 cnt[left] * cnt[right])
    keep = n > 0
    out = pd.DataFrame({"source_a": src[left[keep]],
                        "source_b": src[right[keep]],
                        "n_pairs": n[keep]})
    # per-partition combiner: collapse repeated pairs before the shuffle
    return (out.groupby(["source_a", "source_b"], sort=False)["n_pairs"]
               .sum().reset_index())


def source_overlap(
    ds: "ray.data.Dataset",
    *,
    content_col: str = "text",
    group_col: str = "source",
    trunc: int | None = None,
) -> "ray.data.Dataset":
    """(source_a, source_b, n_pairs) with source_a <= source_b and
    n_pairs > 0: exact-duplicate doc pairs within/between sources.
    ``trunc`` digests only the first N chars (test corpora have no
    full-text dups; mirrors exact_pairs_trunc)."""

    def combine(t: pa.Table) -> pa.Table:
        t = drop_empty(t, content_col=content_col)
        if trunc is not None:
            import pyarrow.compute as pc

            t = t.set_column(
                t.schema.get_field_index(content_col), content_col,
                pc.utf8_slice_codeunits(t.column(content_col), 0, trunc),
            )
        t = add_digests(t, content_col=content_col)
        g = (
            t.select(["digest", "digest_u64", group_col])
            .group_by(["digest", "digest_u64", group_col])
            .aggregate([([], "count_all")])
        )
        g = g.rename_columns(["digest", "digest_u64", group_col, "n"])
        part = np.asarray(g.column("digest_u64"), dtype=np.uint64)
        return g.drop_columns(["digest_u64"]).append_column(
            "__part", pa.array((part % np.uint64(_PARTITIONS)).astype(np.int64))
        )

    parts = ds.select_columns([content_col, group_col]).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # fold cross-batch partials for this digest-hash partition, then
        # one vectorized pair expansion over the sorted runs
        agg = (g.groupby(["digest", group_col], sort=True)["n"]
                .sum().reset_index())
        return _pair_rows(agg, group_col)

    pair_parts = parts.groupby("__part").map_groups(
        per_part, batch_format="pandas"
    )
    final = pair_parts.groupby(["source_a", "source_b"]).sum("n_pairs")
    return final.map_batches(
        lambda t: t.rename_columns(["source_a", "source_b", "n_pairs"]),
        batch_format="pyarrow",
    )


def near_source_overlap(
    ds: "ray.data.Dataset",
    cfg=None,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    group_col: str = "source",
) -> "ray.data.Dataset":
    """(source_a, source_b, n_pairs) at NEAR-dup granularity: doc pairs
    sharing a flagship MinHash cluster, counted within/between sources —
    the provenance question behind crawl scheduling ("which feeds
    near-duplicate which"), one level fuzzier than :func:`source_overlap`.

    Scale shape: the flagship produces (id, cluster_id); ONE id-hash
    cogroup join attaches the source label; a per-batch
    (cluster, source, n) combiner + cluster-hash partition groupby feed
    the same vectorized triangular pair expansion as the exact matrix.
    Cluster-id keys are uint64 — reinterpreted int64 for the shuffle."""
    import dataclasses

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.dupe import dupe_clusters
    from dupers_ray.pipelines.joins import hash_join

    cfg = cfg or DedupConfig()
    if cfg.id_col != id_col:
        cfg = dataclasses.replace(cfg, id_col=id_col)
    clusters = dupe_clusters(
        ds.select_columns([id_col, content_col]), cfg
    )
    labeled = hash_join(
        clusters, ds.select_columns([id_col, group_col]), on=id_col,
        left_schema=pa.schema([(id_col, pa.int64()),
                               ("cluster_id", pa.uint64())]),
        right_schema=pa.schema([(id_col, pa.int64()),
                                (group_col, pa.string())]),
    )

    def combine(t: pa.Table) -> pa.Table:
        g = (
            t.select(["cluster_id", group_col])
            .group_by(["cluster_id", group_col])
            .aggregate([([], "count_all")])
        )
        g = g.rename_columns(["cluster_id", group_col, "n"])
        key = np.asarray(g.column("cluster_id"), dtype=np.uint64)
        return pa.table({
            # int64 view: uint64 groupby keys above 2^63 hit Ray's
            # pickled-object path (BASELINE.md notes)
            "cluster": pa.array(key.view(np.int64)),
            group_col: g.column(group_col),
            "n": g.column("n").cast(pa.int64()),
            "__part": pa.array(
                (key % np.uint64(_PARTITIONS)).astype(np.int64)
            ),
        })

    parts = labeled.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["cluster", group_col], sort=True)["n"]
                .sum().reset_index())
        return _pair_rows(agg, group_col, key_col="cluster")

    pair_parts = parts.groupby("__part").map_groups(
        per_part, batch_format="pandas"
    )
    final = pair_parts.groupby(["source_a", "source_b"]).sum("n_pairs")
    return final.map_batches(
        lambda t: t.rename_columns(["source_a", "source_b", "n_pairs"]),
        batch_format="pyarrow",
    )


def mirror_hosts(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    content_col: str = "text",
    min_jaccard: float = 0.5,
    max_hosts_per_digest: int = 256,
) -> "ray.data.Dataset":
    """Mirror-site detection: host pairs whose DISTINCT content-digest
    sets overlap with exact Jaccard >= ``min_jaccard`` — the classic
    web-crawl question (Bharat & Broder 1999, "Mirror, mirror on the
    web"; public literature) the reference's whole-file dedup can't ask.
    Output: (host_a, host_b, n_inter, n_a, n_b, jaccard), host_a <
    host_b, EXACT values (set semantics, not pair counts — that's
    :func:`source_overlap`).

    Scale shape: per-batch distinct (digest, host) combiner → ONE
    digest-hash shuffle of those rows; each partition holds every copy
    of its digests, so the global distinct, the per-host partial set
    sizes, and the per-digest host-pair expansion are all exact there.
    Hot digests (one page served by thousands of hosts) are capped at
    ``max_hosts_per_digest`` with a logged drop count — never silently.
    Host set sizes are host-cardinality-bounded rows (the PageRank
    rank-vector regime, like linkgraph.py) collected once and broadcast
    into the jaccard finisher; intersection counts never leave the
    shuffle as more than one row per co-hosting pair per partition.
    """
    import logging

    import ray

    logger = logging.getLogger(__name__)

    def combine(t: pa.Table) -> pa.Table:
        t = drop_empty(t, content_col=content_col)
        t = add_digests(t, content_col=content_col)
        g = (
            t.select(["digest", "digest_u64", host_col])
            .group_by(["digest", "digest_u64", host_col])
            .aggregate([])
        )
        part = np.asarray(g.column("digest_u64"), dtype=np.uint64)
        return g.drop_columns(["digest_u64"]).append_column(
            "__part", pa.array((part % np.uint64(_PARTITIONS)).astype(np.int64))
        )

    parts = ds.select_columns([content_col, host_col]).map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # global distinct for this digest partition (cross-batch copies)
        g = g.drop_duplicates(["digest", host_col])
        sizes = g.groupby(host_col, sort=False).size()
        size_rows = pd.DataFrame({
            "host_a": sizes.index.to_numpy(dtype=object),
            "host_b": "",  # sentinel: per-host set-size partial
            "n": sizes.to_numpy(np.int64),
        })
        g = g.sort_values(["digest", host_col], kind="mergesort")
        dg = g["digest"].to_numpy()
        new = np.r_[True, dg[1:] != dg[:-1]] if len(dg) else np.array([], bool)
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes_seg = np.diff(np.r_[starts, len(dg)])
        hot = sizes_seg > max_hosts_per_digest
        if hot.any():
            logger.warning(
                "mirror_hosts: %d hot digests capped at %d hosts (max %d)",
                int(hot.sum()), max_hosts_per_digest, int(sizes_seg.max()),
            )
            rank = np.arange(len(dg)) - starts[seg]
            keepm = rank < max_hosts_per_digest
            g = g.iloc[keepm]
        pairs = _pair_rows(
            g.assign(n=np.ones(len(g), np.int64)), host_col
        ).rename(columns={"source_a": "host_a", "source_b": "host_b",
                          "n_pairs": "n"})
        return pd.concat([size_rows, pairs], ignore_index=True)

    def add_pair_part(t: pa.Table) -> pa.Table:
        # Ray groupby on STRING keys is a global sort (see the verify
        # notes / linkgraph.py) — partition on an int hash of the pair
        # and fold locally instead (measured 27.6 s -> ~7 s at 600 k
        # pages x 500 hosts)
        from dupers_ray.pipelines.maintenance import hash_str_keys

        a = t.column("host_a").to_pandas()
        b = t.column("host_b").to_pandas()
        h = hash_str_keys(pa.array((a + "\x00" + b).tolist(), pa.string()))
        return t.append_column(
            "__pp", pa.array((h % np.uint64(_PARTITIONS)).astype(np.int64))
        )

    def fold_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "host_a": pd.Series([], dtype=object),
                "host_b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        return (
            g.groupby(["host_a", "host_b"], sort=False)["n"]
            .sum().reset_index()
        )

    agg = (
        parts.groupby("__part").map_groups(per_part, batch_format="pandas")
        .map_batches(add_pair_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__pp").map_groups(fold_pairs, batch_format="pandas")
        .materialize()  # consumed twice: size extraction + pair finish
    )

    sizes = {
        r["host_a"]: int(r["n"])
        for r in agg.filter(lambda r: r["host_b"] == "").take_all()
    }
    sref = ray.put(sizes)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t.column("host_b"), ""))
        sz = ray.get(sref)
        a = t.column("host_a").to_pylist()
        b = t.column("host_b").to_pylist()
        inter = np.asarray(t.column("n"), dtype=np.int64)
        na = np.array([sz[h] for h in a], np.int64)
        nb = np.array([sz[h] for h in b], np.int64)
        jac = inter / (na + nb - inter)
        keep = jac >= min_jaccard
        return pa.table({
            "host_a": pa.array(np.asarray(a, object)[keep].tolist(),
                               pa.string()),
            "host_b": pa.array(np.asarray(b, object)[keep].tolist(),
                               pa.string()),
            "n_inter": pa.array(inter[keep]),
            "n_a": pa.array(na[keep]),
            "n_b": pa.array(nb[keep]),
            "jaccard": pa.array(jac[keep]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def mirror_clusters(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    content_col: str = "text",
    min_jaccard: float = 0.5,
    max_hosts_per_digest: int = 256,
) -> "ray.data.Dataset":
    """Site clusters: connected components over the :func:`mirror_hosts`
    graph — "these N hosts are one site" (the transitive closure Bharat
    & Broder run after pairwise detection). Output per host:

    (host, cluster_id)   cluster_id = min sha256-u64 node id of the
                         host's component; singleton hosts keep their
                         own node id.

    Scale shape: the pair graph is host-cardinality-bounded (the
    rank-vector regime mirror_hosts already assumes), so components
    resolves driver-side below ``max_driver_edges`` and falls back to
    the Kiveris star-contraction path above it; the final labeling is
    one broadcast-dict pass over the distinct-host rows."""
    import ray

    from dupers_ray.functions.hashing import node_ids
    from dupers_ray.pipelines.components import components

    pairs = mirror_hosts(
        ds, host_col=host_col, content_col=content_col,
        min_jaccard=min_jaccard, max_hosts_per_digest=max_hosts_per_digest,
    ).materialize()

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array(node_ids(t.column("host_a").to_pylist())),
            "dst": pa.array(node_ids(t.column("host_b").to_pylist())),
        })

    assign = components(
        pairs.map_batches(to_edges, batch_format="pyarrow"), strategy="auto"
    )
    if isinstance(assign, pa.Table):  # driver strategy
        label = {int(n): int(c)
                 for n, c in zip(assign.column("node").to_pylist(),
                                 assign.column("cluster_id").to_pylist())}
    else:  # distributed strategy — label map is host-bounded either way
        label = {int(r["node"]): int(r["cluster_id"])
                 for r in assign.take_all()}
    lref = ray.put(label)

    # distinct hosts: per-batch distinct -> host-hash partition -> distinct
    from dupers_ray.pipelines.maintenance import hash_str_keys

    def host_part(t: pa.Table) -> pa.Table:
        g = t.select([host_col]).group_by(host_col).aggregate([])
        h = hash_str_keys(g.column(host_col))
        return g.append_column(
            "__part", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                host_col: pd.Series([], dtype=object),
                "cluster_id": pd.Series([], dtype="uint64"),
            })
        hosts = g[host_col].drop_duplicates().to_numpy(dtype=object)
        nodes = node_ids(list(hosts))
        lbl = ray.get(lref)
        return pd.DataFrame({
            host_col: hosts,
            "cluster_id": np.array(
                [lbl.get(int(n), int(n)) for n in nodes], np.uint64
            ),
        })

    return (
        ds.select_columns([host_col])
        .map_batches(host_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(finish, batch_format="pandas")
    )
