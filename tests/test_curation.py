"""cluster_representatives: composition check vs brute-force pandas over
the same dupe_clusters + quality_score outputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs_table(n=240, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts = []
    for i in range(n):
        base = i // 4  # groups of 4 exact dups
        r = np.random.default_rng(base)
        texts.append(" ".join(r.choice(vocab, size=30).tolist()))
    _ = rng
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def test_cluster_representatives_matches_bruteforce(ray_session):
    import ray.data as rd

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.curation import cluster_representatives
    from dupers_ray.pipelines.dupe import dupe_clusters
    from dupers_ray.stages.quality import quality_score

    t = _docs_table()
    cfg = DedupConfig(id_col="doc_id", text_col="text")

    got = cluster_representatives(
        rd.from_arrow(t).repartition(6), cfg
    ).to_pandas().sort_values("cluster_id").reset_index(drop=True)

    clusters = dupe_clusters(
        rd.from_arrow(t).repartition(6), cfg
    ).to_pandas()
    scores = quality_score(t).to_pandas()[["doc_id", "score"]]
    j = clusters.merge(scores, on="doc_id")
    j = j.sort_values(["cluster_id", "score", "doc_id"],
                      ascending=[True, False, True])
    exp = j.groupby("cluster_id", sort=True).agg(
        rep_doc=("doc_id", "first"), score=("score", "first"),
        n_docs=("doc_id", "size")).reset_index()

    assert len(got) == len(exp)
    for col in ["cluster_id", "rep_doc", "score", "n_docs"]:
        assert (got[col].to_numpy().astype(np.int64)
                == exp[col].to_numpy().astype(np.int64)).all(), col
    # every group of 4 exact dups collapses to one cluster
    assert (got["n_docs"] >= 4).all()
    assert len(got) == 60


def test_top_per_group_multi_order(ray_session):
    import ray.data as rd

    from dupers_ray.stages.filters import top_per_group

    t = pa.table({
        "g": pa.array([0, 0, 0, 1, 1, 2], pa.int64()),
        "s": pa.array([5, 9, 9, 1, 1, 7], pa.int64()),
        "id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
    })
    out = top_per_group(
        rd.from_arrow(t).repartition(3), group_col="g",
        by=[("s", False), ("id", True)], n=1,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert out["id"].tolist() == [11, 20, 30]  # max s, min id on ties


def test_dedup_summary_consistency(ray_session):
    import ray.data as rd

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.curation import dedup_summary

    t = _docs_table()
    out = dedup_summary(
        rd.from_arrow(t).repartition(6),
        DedupConfig(id_col="doc_id", text_col="text"),
    ).to_pandas()
    # totals reconcile with the corpus: every doc in exactly one cluster
    assert int(out["n_docs"].sum()) == t.num_rows
    assert int((out["cluster_size"] * out["n_clusters"]).sum()) == t.num_rows
    assert int(out["n_removed"].sum()) == t.num_rows - int(out["n_clusters"].sum())
    # the planted groups of 4 exact dups dominate
    assert int(out.loc[out["cluster_size"] >= 4, "n_clusters"].sum()) >= 55


def test_curate_corpus_partitioning_invariant():
    """The composed pipeline is deterministic at any block layout."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from dupers_ray.pipelines.curation import curate_corpus

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    outs = []
    for parts in (1, 4, 13):
        ds = rd.from_arrow(tbl).repartition(parts)
        out = curate_corpus(ds, cap_per_source=5, token_budget=3_000,
                            digest_trunc=40).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    assert len(outs[0]) > 0
    # budget respected and cumulative sums consistent
    assert (outs[0]["cum_tokens"] <= 3_000).all()
    assert outs[0]["n_tokens"].sum() == outs[0]["cum_tokens"].max()


def test_source_dup_stats_invariants(ray_session):
    import ray.data as rd

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.curation import source_dup_stats
    from dupers_ray.pipelines.dupe import dupe_clusters

    t = _docs_table()
    t = t.append_column(
        "source",
        pa.array([f"src{i % 7}" for i in range(t.num_rows)], pa.string()))
    docs = rd.from_arrow(t)
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    out = source_dup_stats(docs, cfg).to_pandas()
    # totals reconcile with the corpus and the flagship assignment
    assert out.n_docs.sum() == t.num_rows
    clus = dupe_clusters(rd.from_arrow(t), cfg).to_pandas()
    sz = clus.groupby("cluster_id")["doc_id"].transform("size")
    assert out.n_dup_docs.sum() == int((sz > 1).sum())
    # ppm is the exact integer ratio per source
    exp = out.n_dup_docs.to_numpy() * 1_000_000 // np.maximum(
        out.n_docs.to_numpy(), 1)
    assert (out.dup_ppm.to_numpy() == exp).all()
    assert (out.n_dup_docs <= out.n_docs).all()


def test_first_publishers_matches_bruteforce(ray_session):
    import ray.data as rd

    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.curation import first_publishers
    from dupers_ray.pipelines.dupe import dupe_clusters

    t = _docs_table()
    ids = t.column("doc_id").to_numpy()
    # scrambled arrivals incl. ties (same ts) -> min-doc_id tiebreak
    ts = ((ids * 7919) % 3) * 1_000_000
    pages = t.append_column("ts_us", pa.array(ts.astype(np.int64)))
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    ds = rd.from_arrow(pages).repartition(5)

    assign = {
        r["doc_id"]: r["cluster_id"]
        for r in dupe_clusters(ds, cfg).take_all()
    }
    by_cluster: dict = {}
    for d, c in assign.items():
        by_cluster.setdefault(c, []).append(d)
    want = {}
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        origin = min(members, key=lambda d: (ts[d], d))
        for d in members:
            if d != origin:
                want[d] = (origin, int(ts[d] - ts[origin]))
    got = {
        r["doc_id"]: (r["origin_id"], r["lag_us"])
        for r in first_publishers(ds, cfg).take_all()
    }
    assert got == want
    assert want, "fixture must contain multi-doc clusters"
    assert any(lag == 0 for _, lag in want.values()), "tie case exercised"
