"""Near-duplicate detection: MinHash → LSH buckets → candidate pairs →
signature-Jaccard verify → edge list.

The scaled analogue of dupers' exact digest lookup (pkg/dupe/dupe.go:919-931)
per BASELINE.json:north_rule. Pipeline shape (SURVEY.md §7.1 step 6):

    signatures = ds.map_batches(MinHasher, concurrency=...)   # actor pool
    bands      = signatures.map_batches(explode_bands)        # stateless
    candidates = bands.groupby(band_id, band_hash)            # ONE shuffle
                     .map_groups(star pairs, capped)
    edges      = candidates dedup + verify (sig Jaccard >= cfg.threshold)

Skew handling: LSH buckets of boilerplate pages can be huge. Each bucket
emits STAR pairs (every member paired with the bucket's min node) — m-1
pairs instead of m(m-2)/2 — which preserves connectivity for clustering,
and a hard ``max_bucket_size`` cap bounds any single reducer; drops are
counted in the emitted ``__dropped`` rows so callers can log them
(no silent truncation).

Verification joins candidate pairs back to the signature dataset twice on
the uint64 node id (hash joins — pairs are small next to the corpus) and
keeps pairs with estimated Jaccard >= cfg.jaccard_threshold.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dupers_ray.config import MinHashConfig, ShingleConfig
from dupers_ray.functions.hashing import splitmix64
from dupers_ray.pipelines.joins import hash_join
from dupers_ray.stages.minhash import MinHasher, explode_bands

logger = logging.getLogger(__name__)


# Per-worker-process MinHasher cache for the stateless-task path: state
# (perm params + compiled tokenizer) builds in ~1 ms, so tasks beat an actor
# pool (no pool spin-up latency, fully elastic) as long as construction is
# amortized per process — which this cache does. The actor-pool path remains
# for configs with genuinely heavy state (e.g. model-based shingling).
_MINHASHER_CACHE: dict = {}


def _minhash_batch(batch, *, shingle, minhash, id_col, text_col):
    key = (shingle, minhash, id_col, text_col)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = MinHasher(shingle=shingle, minhash=minhash, id_col=id_col, text_col=text_col)
        _MINHASHER_CACHE[key] = mh
    return mh(batch)


def _minhash_digest_batch(batch, *, shingle, minhash, id_col, text_col):
    """Fused stage: ONE pass over the text computes BOTH the MinHash
    signature (null for token-less docs) and the exact SHA-256 digest —
    the exact-dedup branch then groups over this table instead of paying a
    second full corpus scan. Rows with null/empty text are dropped
    (ErrFileEmpty parity, dupe.go:47)."""
    from dupers_ray.functions.hashing import (
        hex_prefix_u64,
        node_ids,
        sha256_hex_many,
    )
    from dupers_ray.stages.digest import drop_empty

    key = (shingle, minhash, id_col, text_col)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = MinHasher(shingle=shingle, minhash=minhash, id_col=id_col, text_col=text_col)
        _MINHASHER_CACHE[key] = mh

    b = drop_empty(batch, content_col=text_col)
    ids = b.column(id_col).to_pylist()
    texts = [t if t is not None else "" for t in b.column(text_col).to_pylist()]
    sig, n_sh = mh.signatures(texts)
    keep = n_sh > 0
    from dupers_ray.stages.minhash import pack_sig

    sig_le = pack_sig(sig, minhash.sig_store if minhash else "u4")
    sig_bytes: list[bytes | None] = [None] * len(ids)
    ki = 0
    for i, k in enumerate(keep):
        if k:
            sig_bytes[i] = sig_le[ki].tobytes()
            ki += 1
    hexes = sha256_hex_many([t.encode("utf-8") for t in texts])
    u64b = np.array([int(h[16:32], 16) for h in hexes], dtype=np.uint64)
    return pa.table(
        {
            id_col: b.column(id_col),
            "node": pa.array(node_ids([str(i) for i in ids])),
            "sig": pa.array(sig_bytes, pa.binary()),
            "n_shingles": pa.array(n_sh.astype(np.int64)),
            "digest": pa.array(hexes, pa.string()),
            "digest_u64": pa.array(hex_prefix_u64(hexes)),
            # second sha word: (u64, u64b) keys exact-dup buckets with
            # 2^-128 collision probability — no in-group hex re-check needed
            "digest_u64b": pa.array(u64b),
        }
    )


def minhash_signatures(
    ds: "ray.data.Dataset",
    *,
    shingle: ShingleConfig | None = None,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency=None,
    with_digests: bool = False,
) -> "ray.data.Dataset":
    shingle = shingle or ShingleConfig()
    minhash = minhash or MinHashConfig()
    if with_digests:
        return ds.map_batches(
            _minhash_digest_batch,
            fn_kwargs={
                "shingle": shingle,
                "minhash": minhash,
                "id_col": id_col,
                "text_col": text_col,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    if concurrency is not None:
        return ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={
                "shingle": shingle,
                "minhash": minhash,
                "id_col": id_col,
                "text_col": text_col,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return ds.map_batches(
        _minhash_batch,
        fn_kwargs={
            "shingle": shingle,
            "minhash": minhash,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def _bucket_pairs(g: pd.DataFrame, max_bucket_size: int) -> pd.DataFrame:
    """LSH (sub-)bucket partition → star pairs, plus one ANCHOR row per
    salted sub-bucket (kind=1, carrying band_hash) so a second, tiny
    groupby can stitch a hot bucket's sub-buckets back together. Groups
    arrive merged by coarse partition key; split by (band_hash, salt)."""
    a_out: list[int] = []
    b_out: list[int] = []
    anch_a: list[int] = []
    anch_bh: list[int] = []
    dropped = 0
    for (bh, salt), sub in g.groupby(["band_hash", "salt"], sort=False):
        nodes = np.unique(sub["node"].to_numpy(dtype=np.uint64))
        salted = bool(salt)  # salt>0 ⇒ member of a detected hot bucket
        if len(nodes) > max_bucket_size:
            dropped += len(nodes) - max_bucket_size
            nodes = nodes[:max_bucket_size]  # deterministic: sorted by node id
        anchor = int(nodes[0])
        if salted:
            anch_a.append(anchor)
            anch_bh.append(int(bh))
        if len(nodes) >= 2:
            a_out.extend([anchor] * (len(nodes) - 1))
            b_out.extend(int(n) for n in nodes[1:])
    if dropped:
        logger.warning("LSH bucket cap dropped %d members (skew guard)", dropped)
    n_pairs, n_anch = len(a_out), len(anch_a)
    return pd.DataFrame(
        {
            "src": pd.Series(a_out + anch_a, dtype=np.uint64),
            "dst": pd.Series(b_out + [0] * n_anch, dtype=np.uint64),
            "band_hash": pd.Series([0] * n_pairs + anch_bh, dtype=np.uint64),
            "kind": pd.Series([0] * n_pairs + [1] * n_anch, dtype=np.int8),
        }
    )


def _bucket_pairs_cold(g: pa.Table, max_bucket_size: int) -> pa.Table:
    """Fast path for unsalted buckets: star pairs only, no anchor rows.
    Vectorized over the whole partition (sort by band_hash, segment by
    boundaries) instead of a per-bucket pandas loop. Arrow in/out so the
    downstream union never mixes block types."""
    bh = np.asarray(g.column("band_hash"), dtype=np.uint64)
    node = np.asarray(g.column("node"), dtype=np.uint64)
    order = np.lexsort((node, bh))
    bh, node = bh[order], node[order]
    # segment starts per bucket
    new = np.r_[True, bh[1:] != bh[:-1]]
    seg_id = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(bh)])
    # drop duplicate nodes within a bucket (same doc seen twice can't happen
    # per band, but be safe across merged groups)
    # anchor per bucket = first (min) node of its segment
    anchors = node[starts]
    anchor_per_row = anchors[seg_id]
    keep = node != anchor_per_row  # every non-anchor row pairs with anchor
    sz_per_row = sizes[seg_id]
    keep &= sz_per_row > 1
    # cap: member rank within its segment must be < max_bucket_size
    rank = np.arange(len(bh)) - starts[seg_id]
    over = rank >= max_bucket_size
    dropped = int(over.sum())
    if dropped:
        logger.warning("LSH bucket cap dropped %d members (skew guard)", dropped)
    keep &= ~over
    return pa.table(
        {
            "src": pa.array(anchor_per_row[keep]),
            "dst": pa.array(node[keep]),
        }
    )


def detect_hot_buckets(
    bands: "ray.data.Dataset",
    *,
    batch_threshold: int = 4,
    hot_threshold: int = 256,
    top_k_per_batch: int = 64,
) -> np.ndarray:
    """Sorted uint64 array of band hashes whose buckets are HOT.

    Sampling-free two-step: (1) per batch, count band_hash frequencies and
    keep only hashes seen >= batch_threshold times (top_k per batch) — a
    bucket of global size f appears ~f*B/N times in a B-row batch, so truly
    hot buckets are caught with near-certainty while the suspected set
    stays tiny; (2) sum suspected counts and keep >= hot_threshold. The
    returned set is broadcast to the salting stage. Under-detection only
    costs balance (the per-bucket cap still bounds memory), never
    correctness."""

    def suspects(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("band_hash"), dtype=np.uint64)
        uniq, cnt = np.unique(v, return_counts=True)
        keep = cnt >= batch_threshold
        uniq, cnt = uniq[keep], cnt[keep]
        if len(uniq) > top_k_per_batch:
            top = np.argsort(cnt)[::-1][:top_k_per_batch]
            uniq, cnt = uniq[top], cnt[top]
        # group key reinterpreted as int64: Ray's aggregate converts uint64
        # keys above 2^63 through Python ints and falls back to pickled
        # object blocks (OverflowError) — a silent 10x slowdown
        return pa.table(
            {
                "band_hash": pa.array(uniq.view(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    sus = bands.map_batches(suspects, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    agg = sus.groupby("band_hash").aggregate(Sum("cnt", alias_name="cnt"))
    rows = agg.take_all()  # suspected set is small by construction
    hot = np.array(
        [r["band_hash"] for r in rows if r["cnt"] >= hot_threshold], dtype=np.int64
    ).view(np.uint64)
    hot.sort()
    if len(hot):
        logger.info("detected %d hot LSH buckets", len(hot))
    return hot


def candidate_pairs(
    signatures: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    dedup: bool = True,
    salt_buckets: int = 16,
    hot_threshold: int | None = None,
) -> "ray.data.Dataset":
    """(src, dst) node-id candidate pairs from LSH buckets. src < dst is
    NOT guaranteed (src is the bucket anchor = min). With dedup=False,
    cross-band duplicate pairs remain — callers that feed the pairs into a
    src-keyed join (verify_pairs) dedup there for free (dedup_left) and
    skip this extra shuffle.

    Skew handling (north rule): buckets detected as HOT are salted into
    ``salt_buckets`` sub-buckets keyed (band_hash, 1 + node % S) so no
    single shuffle partition holds a whole boilerplate bucket; each
    sub-bucket emits member star pairs plus an anchor row, and a second,
    TINY groupby over anchor rows stitches the sub-buckets together with
    anchor star pairs. Every emitted pair — member or anchor — still goes
    through Jaccard verification downstream, so salting never trades
    precision."""
    cfg = minhash or MinHashConfig()
    num_partitions = 256  # coarse shuffle partitions; buckets sub-grouped inside
    bands = signatures.map_batches(
        explode_bands,
        fn_kwargs={"bands": cfg.bands, "rows": cfg.rows, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["band_hash", "node"])
    # two consumers (hot detection, salting): materialize the slim 16-byte
    # rows once rather than re-running the explode; at extreme scale where
    # 32x-doc-count rows can't be pinned, flip to recompute-from-sigs
    bands = bands.materialize()

    hot = detect_hot_buckets(
        bands, hot_threshold=hot_threshold or cfg.max_bucket_size
    )
    hot_ref = ray.put(hot)

    def add_salt_and_part(t: pa.Table) -> pa.Table:
        hot_ = ray.get(hot_ref)
        bh = np.asarray(t.column("band_hash"), dtype=np.uint64)
        node = np.asarray(t.column("node"), dtype=np.uint64)
        if len(hot_):
            pos = np.searchsorted(hot_, bh)
            pos = np.clip(pos, 0, len(hot_) - 1)
            is_hot = hot_[pos] == bh
        else:
            is_hot = np.zeros(len(bh), bool)
        salt = np.where(
            is_hot, 1 + (node % np.uint64(salt_buckets)).astype(np.int64), 0
        )
        with np.errstate(over="ignore"):
            pk = splitmix64(bh + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table(
            {
                "band_hash": t.column("band_hash"),
                "node": t.column("node"),
                "salt": pa.array(salt.astype(np.int64)),
                "__part": pa.array((pk % np.uint64(num_partitions)).astype(np.int64)),
            }
        )

    import pyarrow.compute as pc

    salted = bands.map_batches(
        add_salt_and_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def star_pairs(ds):
        return ds.groupby("__part").map_groups(
            _bucket_pairs_cold,
            fn_kwargs={"max_bucket_size": cfg.max_bucket_size},
            batch_format="pyarrow",
        )

    if len(hot) == 0:
        pairs = star_pairs(salted)
    else:
        # route hot-bucket rows (a small fraction: hot docs × bands) onto
        # their own path so the main stream stays a single groupby and the
        # anchor-stitch shuffle only ever touches the tiny hot subset
        cold_pairs = star_pairs(
            salted.map_batches(
                lambda t: t.filter(pc.equal(t.column("salt"), 0)),
                batch_format="pyarrow",
            )
        )
        hot_rows = salted.map_batches(
            lambda t: t.filter(pc.greater(t.column("salt"), 0)),
            batch_format="pyarrow",
        ).materialize()
        hot_staged = (
            hot_rows.groupby("__part")
            .map_groups(
                _bucket_pairs,
                fn_kwargs={"max_bucket_size": cfg.max_bucket_size},
                batch_format="pandas",
            )
            .materialize()  # tiny; consumed twice (member pairs + anchors)
        )
        hot_pairs = hot_staged.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0)).select(["src", "dst"]),
            batch_format="pyarrow",
        )

        # stage 2: stitch hot sub-buckets — star pairs over the anchors.
        # Anchor count is bounded by |hot| * salt_buckets (both driver-known
        # and small), so this runs DRIVER-SIDE: an AllToAll operator costs
        # ~seconds of pure scheduling even for a few hundred rows.
        anchor_tbls = [
            b.filter(pc.equal(b.column("kind"), 1))
            for b in hot_staged.iter_batches(batch_format="pyarrow")
        ]
        anchor_tbls = [b for b in anchor_tbls if len(b)]
        if anchor_tbls:
            at = pa.concat_tables(anchor_tbls)
            abh = np.asarray(at.column("band_hash"), dtype=np.uint64)
            anode = np.asarray(at.column("src"), dtype=np.uint64)
            order = np.lexsort((anode, abh))
            abh, anode = abh[order], anode[order]
            new = np.r_[True, abh[1:] != abh[:-1]]
            seg = np.cumsum(new) - 1
            starts = np.flatnonzero(new)
            anchors_per_row = anode[starts][seg]
            keep = anode != anchors_per_row
            anchor_pairs_tbl = pa.table(
                {"src": pa.array(anchors_per_row[keep]), "dst": pa.array(anode[keep])}
            )
        else:
            anchor_pairs_tbl = pa.table(
                {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64())}
            )
        anchor_pairs = ray.data.from_arrow(anchor_pairs_tbl)
        pairs = cold_pairs.union(hot_pairs).union(anchor_pairs)
    if not dedup:
        return pairs

    # dedupe identical pairs found by multiple bands: group by pair hash
    def add_pair_part(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.uint64)
        d = np.asarray(t.column("dst"), dtype=np.uint64)
        with np.errstate(over="ignore"):
            ph = splitmix64(s * np.uint64(0x100000001B3) + d)
        return t.append_column(
            "__part", pa.array((ph % np.uint64(num_partitions)).astype(np.int64))
        )

    def first_per_pair(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop_duplicates(subset=["src", "dst"])[["src", "dst"]]
            .reset_index(drop=True)
        )

    return (
        pairs.map_batches(add_pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(first_per_pair, batch_format="pandas")
    )


def verify_pairs(
    pairs: "ray.data.Dataset",
    signatures: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    num_partitions: int = 32,
    strategy: str = "auto",
    broadcast_limit: int = 2_000_000,
    compare: str = "fold16",
) -> "ray.data.Dataset":
    """Keep pairs whose signature-estimated Jaccard >= cfg.jaccard_threshold.
    Output: (src, dst, jaccard).

    strategy="broadcast": the signature table is ray.put ONCE (node-sorted
    arrays) and each pairs batch scores via searchsorted lookups — zero
    shuffles. Right up to ~2M docs (about 1 GB of signatures); the default
    "auto" picks it when the signature count fits, else falls back to
    "join" (two cogroup hash joins — the 10^12-doc path).

    ``compare="fold16"`` (default): BOTH paths compare uint16 signature
    folds, so broadcast ≡ join exactly (the auto strategy switch can
    never change the edge set) and both match the SQL oracle's
    restatement; the fold adds ≤(1-J)/65536 estimate bias.
    ``compare="full"`` keeps the unbiased full-uint32 comparison on the
    join path for callers who want the estimate over cross-strategy
    reproducibility."""
    cfg = minhash or MinHashConfig()
    if strategy == "auto":
        n_sigs = signatures.count()
        strategy = "broadcast" if n_sigs <= broadcast_limit else "join"
    if strategy == "broadcast":
        return _verify_pairs_broadcast(pairs, signatures, cfg)
    sigs = signatures.select_columns(["node", "sig"])

    pairs_schema = pa.schema([("src", pa.uint64()), ("dst", pa.uint64())])
    sig_schema = pa.schema([("node", pa.uint64()), ("sig", pa.binary())])
    # dedup_left: star pairs repeat across bands with the same src (bucket
    # anchor), so per-partition full-row dedup inside the src-keyed join is
    # a complete cross-band dedup — no dedicated dedup shuffle needed
    j1 = hash_join(pairs, sigs, on="src", right_on="node",
                   num_partitions=num_partitions,
                   left_schema=pairs_schema, right_schema=sig_schema,
                   dedup_left=True)
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["sig_src" if c == "sig" else c for c in t.column_names]
        ).drop_columns([c for c in ("node",) if c in t.column_names]),
        batch_format="pyarrow",
    )
    j1_schema = pa.schema(
        [("src", pa.uint64()), ("dst", pa.uint64()), ("sig_src", pa.binary())]
    )
    j2 = hash_join(j1, sigs, on="dst", right_on="node",
                   num_partitions=num_partitions,
                   left_schema=j1_schema, right_schema=sig_schema)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        from dupers_ray.stages.minhash import fold16_matrix, sig_matrix

        if compare == "fold16":
            a = fold16_matrix(t.column("sig_src"), cfg.num_perm)
            b = fold16_matrix(t.column("sig"), cfg.num_perm)
        else:
            a = sig_matrix(t.column("sig_src"), cfg.num_perm)
            b = sig_matrix(t.column("sig"), cfg.num_perm)
            if a.dtype == np.uint16 or b.dtype == np.uint16:
                # a u2 store only holds the folds — comparing them would
                # silently BE the fold16 estimate under a 'full' contract
                raise ValueError(
                    "compare='full' requires sig_store='u4' signatures; "
                    "this table stores uint16 folds"
                )
        jac = (a == b).mean(axis=1)
        keep = jac >= cfg.jaccard_threshold
        return pa.table(
            {
                "src": t.column("src").filter(pa.array(keep)),
                "dst": t.column("dst").filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow")


def _verify_pairs_broadcast(
    pairs: "ray.data.Dataset",
    signatures: "ray.data.Dataset",
    cfg: MinHashConfig,
) -> "ray.data.Dataset":
    """Broadcast-verify: signatures collected into (sorted nodes, sig
    matrix) numpy arrays, shipped once via ray.put; per pairs batch:
    in-batch (src,dst) dedup + searchsorted lookups + vectorized equality
    mean. No shuffle; duplicate pairs across batches produce duplicate
    edges, which connected components tolerates."""
    import ray as _ray

    import pyarrow.compute as pc

    refs = signatures.select_columns(["node", "sig"]).to_arrow_refs()
    tables = [t for t in _ray.get(refs) if len(t)]
    tables = [
        t.filter(pc.is_valid(t.column("sig"))) if t.column("sig").null_count else t
        for t in tables
    ]
    tables = [t for t in tables if len(t)]
    if tables:
        at = pa.concat_tables(tables)
        nodes = np.asarray(at.column("node"), dtype=np.uint64)
        # compare LOW uint16 HALVES: equality of uint16 folds adds a
        # false-match probability of 1/65536 per component (bias <= +0.0015%
        # on the Jaccard estimate — round-1 ADVICE flagged the old uint8
        # fold's 1/256 bias as a strategy-boundary reproducibility wart)
        # while still halving the scoring loop's gather bandwidth vs u4.
        # fold16_matrix reinterprets the Arrow buffer in place — the old
        # to_pylist+join here copied ~300 MB on the DRIVER, a measured
        # ~2 s serial floor in the flagship at every CPU level; under a
        # "u2" signature store the stored bytes ARE the folds (no slice)
        from dupers_ray.stages.minhash import fold16_matrix

        mat = np.ascontiguousarray(fold16_matrix(at.column("sig"), cfg.num_perm))
        order = np.argsort(nodes, kind="stable")
        nodes, mat = nodes[order], mat[order]
    else:
        nodes = np.empty(0, np.uint64)
        mat = np.empty((0, cfg.num_perm), np.uint16)
    ref = _ray.put((nodes, mat))
    thr = cfg.jaccard_threshold

    def score(t: pa.Table) -> pa.Table:
        # stateless task: ray.get of a local plasma object is zero-copy and
        # near-free after the first fetch per node — no actor pool needed
        nodes_, mat_ = _ray.get(ref)
        empty = pa.table(
            {"src": pa.array([], pa.uint64()), "dst": pa.array([], pa.uint64()),
             "jaccard": pa.array([], pa.float64())}
        )
        if len(t) == 0 or len(nodes_) == 0:
            return empty
        s = np.asarray(t.column("src"), dtype=np.uint64)
        d = np.asarray(t.column("dst"), dtype=np.uint64)
        # in-batch pair dedup (cross-band duplicates are common)
        with np.errstate(over="ignore"):
            key = s * np.uint64(0x100000001B3) + d
        _, first = np.unique(key, return_index=True)
        s, d = s[first], d[first]
        si = np.clip(np.searchsorted(nodes_, s), 0, len(nodes_) - 1)
        di = np.clip(np.searchsorted(nodes_, d), 0, len(nodes_) - 1)
        ok = (nodes_[si] == s) & (nodes_[di] == d)
        if not ok.any():
            return empty
        s, d, si, di = s[ok], d[ok], si[ok], di[ok]
        jac = (mat_[si] == mat_[di]).mean(axis=1)
        keep = jac >= thr
        return pa.table(
            {
                "src": pa.array(s[keep]),
                "dst": pa.array(d[keep]),
                "jaccard": pa.array(jac[keep].astype(np.float64)),
            }
        )

    return pairs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )


def near_dup_edges(
    ds: "ray.data.Dataset",
    *,
    shingle: ShingleConfig | None = None,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    concurrency=None,
    with_digests: bool = False,
    candidates_impl: str = "index",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Full near-dup front half. Returns (verified edge list with node ids,
    signature dataset with the id<->node mapping).

    The signature dataset is materialized once: it is consumed twice
    (banding + verification joins) and is compact — id + node + num_perm
    uint32s per doc, the wide text/html columns are NOT carried — so
    pinning it beats recomputing shingles. At 100 TB input this is the
    designed checkpoint dataset (write_parquet instead of materialize)."""
    sigs = minhash_signatures(
        ds, shingle=shingle, minhash=minhash, id_col=id_col,
        text_col=text_col, concurrency=concurrency, with_digests=with_digests,
    )
    if candidates_impl == "sort":
        # coalesce to ~2 blocks per CPU before materializing: every
        # downstream sort AllToAll pays per-block scheduling overhead on
        # the order of seconds per hundred blocks (measured: 224 blocks →
        # 30 s, 64 blocks → 7 s for the same shuffle). The index path has
        # no sorts — skip the extra exchange there.
        try:
            import ray as _ray

            ncpu = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:  # noqa: BLE001
            ncpu = 8
        sigs = sigs.repartition(max(8, 2 * ncpu))
    sigs = sigs.materialize()
    n_sigs = sigs.count()
    use_broadcast = n_sigs <= 2_000_000
    if candidates_impl == "index":
        # sharded-actor bucket index: no AllToAll at all, deterministic
        # min-node anchors, hot buckets need no salting (stages/bucket_index)
        from dupers_ray.stages.bucket_index import candidate_pairs_index

        pairs = candidate_pairs_index(sigs, minhash=minhash, id_col=id_col)
    else:
        # broadcast verify dedups pairs in-batch, so the dedicated pair-dedup
        # shuffle is only worth paying on the large (join-verify) path, where
        # cross-band duplicates (32x for exact-dup clusters) would otherwise
        # flood the join shuffle
        pairs = candidate_pairs(
            sigs, minhash=minhash, id_col=id_col, dedup=not use_broadcast
        )
    edges = verify_pairs(
        pairs, sigs, minhash=minhash,
        strategy="broadcast" if use_broadcast else "join",
    )
    return edges, sigs


def pair_similarity_histogram(
    ds: "ray.data.Dataset",
    *,
    shingle: "ShingleConfig | None" = None,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    bin_comps: int = 8,
) -> "ray.data.Dataset":
    """Threshold-sweep report: DISTINCT LSH candidate pairs histogrammed
    by signature fold-match count — the MEASURED S-curve a user reads
    next to :func:`dupers_ray.stages.minhash.plan_lsh`'s analytic one to
    pick ``jaccard_threshold`` / banding for a corpus. Output one row
    per occupied bucket:

    (bucket, min_jaccard, n_pairs)   bucket = matches // bin_comps,
                                     min_jaccard = bucket*bin_comps/num_perm

    Scale shape: signatures → banded candidates with the GLOBAL pair
    dedup shuffle (16 B rows; multiplicity matters for a histogram,
    unlike for components) → fold16 verify at threshold 0 (keeps every
    candidate, broadcast or join by size) → per-batch bincount combiner
    → one ≤(num_perm/bin_comps+1)-row groupby. SQL oracle: the shared
    signature CTE (_sig_sql_prefix) + a list_filter match count."""
    from dataclasses import replace

    from ray.data.aggregate import Sum

    cfg = minhash or MinHashConfig()
    if bin_comps < 1 or cfg.num_perm % bin_comps:
        raise ValueError("bin_comps must divide num_perm")
    sigs = minhash_signatures(
        ds, shingle=shingle, minhash=cfg, id_col=id_col, text_col=text_col
    ).materialize()
    pairs = candidate_pairs(sigs, minhash=cfg, id_col=id_col, dedup=True)
    scored = verify_pairs(
        pairs, sigs, minhash=replace(cfg, jaccard_threshold=0.0),
        compare="fold16",
    )
    num_perm, width = cfg.num_perm, bin_comps
    n_bins = num_perm // bin_comps + 1

    def combine(t: pa.Table) -> pa.Table:
        jac = np.asarray(t.column("jaccard"), dtype=np.float64)
        m = np.rint(jac * num_perm).astype(np.int64)
        cnt = np.bincount(m // width, minlength=n_bins)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "n": pa.array(cnt[nz].astype(np.int64)),
        })

    agg = scored.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(Sum("n", alias_name="n_pairs"))

    def finish(t: pa.Table) -> pa.Table:
        b = np.asarray(t.column("bucket"), dtype=np.int64)
        return pa.table({
            "bucket": t.column("bucket"),
            "min_jaccard": pa.array(b * width / num_perm),
            "n_pairs": t.column("n_pairs"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def bucket_size_histogram(
    signatures: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
) -> "ray.data.Dataset":
    """LSH bucket-size histogram → (bucket_size, n_buckets): the skew
    diagnostic behind detect_hot_buckets/salting, driver-visible.  The
    long tail of size-1 buckets is the healthy mass; a handful of
    10^4-member buckets is boilerplate skew that would serialize the
    candidate shuffle without salting (north rule: skew handled
    explicitly — this is the measurement that proves which regime the
    corpus is in).  Scale shape: explode to 16-byte (band_hash) rows,
    per-batch count combiner → ONE groupby of count rows → per-batch
    size histogram → ONE tiny groupby; the corpus never shuffles."""
    from ray.data.aggregate import Sum

    cfg = minhash or MinHashConfig()
    bands = signatures.map_batches(
        explode_bands,
        fn_kwargs={"bands": cfg.bands, "rows": cfg.rows, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["band_hash"])

    def count_partial(t: pa.Table) -> pa.Table:
        bh = np.asarray(t.column("band_hash"), dtype=np.uint64)
        uniq, cnt = np.unique(bh, return_counts=True)
        return pa.table({
            "bh": pa.array(uniq.view(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    from dupers_ray.functions.grouping import partitioned_aggregate

    sizes = partitioned_aggregate(
        bands.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True,
        ),
        "bh", sums=("n",),  # distinct band hashes are corpus-sized
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(n, return_counts=True)
        return pa.table({
            "bucket_size": pa.array(uniq.astype(np.int64)),
            "n_buckets": pa.array(cnt.astype(np.int64)),
        })

    return sizes.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True,
    ).groupby("bucket_size").aggregate(Sum("n_buckets", alias_name="n_buckets"))


def windowed_near_pairs(
    ds: "ray.data.Dataset",
    *,
    window_us: int,
    id_col: str = "doc_id",
    ts_col: str = "ts_us",
    text_col: str = "text",
    shingle: ShingleConfig | None = None,
    minhash: MinHashConfig | None = None,
    max_bucket: int = 4096,
    n_parts: int = 64,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Time-windowed near-dup candidate pairs: (src_id, dst_id, dt_us)
    for doc pairs that share >= 1 LSH band bucket AND arrived within
    ``window_us`` of each other — the bounded-history streaming analogue
    of dupers' walkCompare-against-recent-scans (pkg/dupe/dupe.go:940-966
    checks new files only against the existing bucket, not all history).

    Scale shape — why epoch co-location instead of the plain band
    groupby: a boilerplate band bucket grows WITH CORPUS AGE under the
    global (band, hash) key, so a long-running crawl concentrates ever
    more rows on one reducer. Keying by (band, hash, epoch := ts //
    window) bounds every reducer cell at 2x one window's occupancy
    forever. Each band row is emitted twice — home epoch e and probe
    epoch e+1 — so any pair with |dt| <= window shares >= 1 cell
    (|dt| <= W implies epoch delta <= 1); a pair is OWNED by the cell
    where >= 1 member is home, which de-duplicates the replica-replica
    copy without cross-cell traffic. Three shuffles of 40-byte rows,
    text never leaves the signature scan:
      1. fused signature+band+replicate scan -> (band, hash, epoch) rows,
      2. ONE groupby on hash(band, hash, epoch) % n_parts; within cell,
         segment_pairs (hot cells capped at ``max_bucket``, logged),
      3. ONE groupby on a pair-hash partition; distinct (src, dst).
    """
    shingle = shingle or ShingleConfig()
    minhash = minhash or MinHashConfig()
    from dupers_ray.functions.pairs import segment_pairs
    from dupers_ray.stages.minhash import mix_rows_u64

    bands_n, rows_n = minhash.bands, minhash.rows
    w = np.int64(window_us)

    def prep(batch: pa.Table) -> pa.Table:
        key = (shingle, minhash, id_col, text_col)
        mh = _MINHASHER_CACHE.get(key)
        if mh is None:
            mh = MinHasher(
                shingle=shingle, minhash=minhash,
                id_col=id_col, text_col=text_col,
            )
            _MINHASHER_CACHE[key] = mh
        ts_arr = batch.column(ts_col)
        if pa.types.is_timestamp(ts_arr.type):
            ts_arr = ts_arr.cast(pa.int64())
        ts = np.asarray(ts_arr, dtype=np.int64)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        texts = [
            t if t is not None else ""
            for t in batch.column(text_col).to_pylist()
        ]
        sig, n_sh = mh.signatures(texts)
        keep = n_sh > 0
        ids, ts = ids[keep], ts[keep]
        d = len(ids)
        if d == 0:
            return pa.table({
                "band": pa.array([], pa.int32()),
                "bh": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "cell": pa.array([], pa.int64()),
                "home": pa.array([], pa.bool_()),
                "__part": pa.array([], pa.int64()),
            })
        mat = sig.reshape(d, bands_n, rows_n).astype(np.uint64)
        bh = np.empty((d, bands_n), np.uint64)
        with np.errstate(over="ignore"):
            for b in range(bands_n):
                bh[:, b] = mix_rows_u64(mat[:, b, :] + np.uint64(b + 1))
        epoch = ts // w  # floor toward -inf not needed: ts >= 0 by contract
        band_col = np.tile(np.arange(bands_n, dtype=np.int32), d)
        bh_flat = bh.reshape(-1)
        doc_rep = np.repeat(ids, bands_n)
        ts_rep = np.repeat(ts, bands_n)
        ep_rep = np.repeat(epoch, bands_n)
        n = d * bands_n
        band2 = np.concatenate([band_col, band_col])
        bh2 = np.concatenate([bh_flat, bh_flat])
        doc2 = np.concatenate([doc_rep, doc_rep])
        ts2 = np.concatenate([ts_rep, ts_rep])
        cell2 = np.concatenate([ep_rep, ep_rep + 1])
        home2 = np.concatenate([
            np.ones(n, np.bool_), np.zeros(n, np.bool_),
        ])
        with np.errstate(over="ignore"):
            mix = splitmix64(
                bh2
                + splitmix64(
                    band2.astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    + cell2.view(np.uint64)
                )
            )
        return pa.table({
            "band": pa.array(band2),
            "bh": pa.array(bh2.view(np.int64)),
            "doc": pa.array(doc2),
            "ts": pa.array(ts2),
            "cell": pa.array(cell2),
            "home": pa.array(home2),
            "__part": pa.array((mix % np.uint64(n_parts)).astype(np.int64)),
        })

    def cell_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "dt": pa.array([], pa.int64()),
            "__ppart": pa.array([], pa.int64()),
        })
        if not g.num_rows:
            return empty
        band = np.asarray(g.column("band"), dtype=np.int64)
        bh = np.asarray(g.column("bh"), dtype=np.int64)
        cell = np.asarray(g.column("cell"), dtype=np.int64)
        doc = np.asarray(g.column("doc"), dtype=np.int64)
        ts = np.asarray(g.column("ts"), dtype=np.int64)
        home = np.asarray(g.column("home"), dtype=np.bool_)
        order = np.lexsort((doc, cell, bh, band))
        band, bh, cell = band[order], bh[order], cell[order]
        doc, ts, home = doc[order], ts[order], home[order]
        new = np.r_[
            True,
            (band[1:] != band[:-1])
            | (bh[1:] != bh[:-1])
            | (cell[1:] != cell[:-1]),
        ]
        skey = np.cumsum(new)
        ii, jj, over, mx = segment_pairs(skey, max_bucket=max_bucket)
        if over:
            logger.warning(
                "windowed_near_pairs: %d hot cells capped at %d rows "
                "(max %d held)", over, max_bucket, mx,
            )
        if not len(ii):
            return empty
        dt = np.abs(ts[ii] - ts[jj])
        m = (dt <= window_us) & (home[ii] | home[jj])
        ii, jj, dt = ii[m], jj[m], dt[m]
        if not len(ii):
            return empty
        src = np.minimum(doc[ii], doc[jj])
        dst = np.maximum(doc[ii], doc[jj])
        with np.errstate(over="ignore"):
            mix = splitmix64(
                src.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + dst.view(np.uint64)
            )
        return pa.table({
            "src": pa.array(src),
            "dst": pa.array(dst),
            "dt": pa.array(dt),
            "__ppart": pa.array((mix % np.uint64(n_parts)).astype(np.int64)),
        })

    def dedup(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "src_id": pa.array([], pa.int64()),
            "dst_id": pa.array([], pa.int64()),
            "dt_us": pa.array([], pa.int64()),
        })
        if not g.num_rows:
            return empty
        src = np.asarray(g.column("src"), dtype=np.int64)
        dst = np.asarray(g.column("dst"), dtype=np.int64)
        dt = np.asarray(g.column("dt"), dtype=np.int64)
        # dt is a function of the pair, so unique over the triple == pair
        key = np.stack([src, dst, dt], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table({
            "src_id": pa.array(uniq[:, 0]),
            "dst_id": pa.array(uniq[:, 1]),
            "dt_us": pa.array(uniq[:, 2]),
        })

    return (
        ds.map_batches(
            prep, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby("__part")
        .map_groups(cell_pairs, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(dedup, batch_format="pyarrow")
    )
