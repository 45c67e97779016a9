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


def minhash_signatures(
    ds: "ray.data.Dataset",
    *,
    shingle: ShingleConfig | None = None,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    batch_size: int = 1024,
    concurrency=None,
) -> "ray.data.Dataset":
    shingle = shingle or ShingleConfig()
    minhash = minhash or MinHashConfig()
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
    """LSH bucket partition → star pairs. Groups arrive merged by coarse
    partition key; split by the (band-salted) band_hash."""
    a_out: list[int] = []
    b_out: list[int] = []
    dropped = 0
    for _, sub in g.groupby("band_hash", sort=False):
        nodes = np.unique(sub["node"].to_numpy(dtype=np.uint64))
        if len(nodes) < 2:
            continue
        if len(nodes) > max_bucket_size:
            dropped += len(nodes) - max_bucket_size
            nodes = nodes[:max_bucket_size]  # deterministic: sorted by node id
        anchor = int(nodes[0])
        a_out.extend([anchor] * (len(nodes) - 1))
        b_out.extend(int(n) for n in nodes[1:])
    if dropped:
        logger.warning("LSH bucket cap dropped %d members (skew guard)", dropped)
    return pd.DataFrame(
        {
            "src": pd.Series(a_out, dtype=np.uint64),
            "dst": pd.Series(b_out, dtype=np.uint64),
            "__dropped": pd.Series([dropped] + [0] * (len(a_out) - 1) if a_out else [], dtype=np.int64),
        }
    )


def candidate_pairs(
    signatures: "ray.data.Dataset",
    *,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    dedup: bool = True,
) -> "ray.data.Dataset":
    """(src, dst) node-id candidate pairs from LSH buckets. src < dst is
    NOT guaranteed (src is the bucket anchor = min). With dedup=False,
    cross-band duplicate pairs remain — callers that feed the pairs into a
    src-keyed join (verify_pairs) dedup there for free (dedup_left) and
    skip this extra shuffle."""
    cfg = minhash or MinHashConfig()
    num_partitions = 256  # coarse shuffle partitions; buckets sub-grouped inside
    bands = signatures.map_batches(
        explode_bands,
        fn_kwargs={"bands": cfg.bands, "rows": cfg.rows, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).select_columns(["band_hash", "node"])

    def add_bucket_part(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("band_hash"), dtype=np.uint64)
        return t.append_column(
            "__part", pa.array((v % np.uint64(num_partitions)).astype(np.int64))
        )

    pairs = (
        bands.map_batches(add_bucket_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            _bucket_pairs,
            fn_kwargs={"max_bucket_size": cfg.max_bucket_size},
            batch_format="pandas",
        )
    )

    pairs = pairs.drop_columns(["__dropped"])
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
) -> "ray.data.Dataset":
    """Keep pairs whose signature-estimated Jaccard >= cfg.jaccard_threshold.
    Output: (src, dst, jaccard). Two hash joins on node id."""
    cfg = minhash or MinHashConfig()
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
        n = len(t)
        a = np.frombuffer(b"".join(t.column("sig_src").to_pylist()), dtype="<u4").reshape(n, -1)
        b = np.frombuffer(b"".join(t.column("sig").to_pylist()), dtype="<u4").reshape(n, -1)
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


def near_dup_edges(
    ds: "ray.data.Dataset",
    *,
    shingle: ShingleConfig | None = None,
    minhash: MinHashConfig | None = None,
    id_col: str = "url",
    text_col: str = "text",
    concurrency=None,
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
        text_col=text_col, concurrency=concurrency,
    ).materialize()
    pairs = candidate_pairs(sigs, minhash=minhash, id_col=id_col, dedup=False)
    edges = verify_pairs(pairs, sigs, minhash=minhash)
    return edges, sigs
