"""Measured dup-pair recall of the flagship vs the bench corpus's planted
ground truth (north rule: recall >= 0.99). The synthetic pages corpus
ships truth.parquet (url, cluster_id, kind); a true dup pair is recalled
iff both members land in one predicted cluster. Counting is per-true-
cluster pair arithmetic — no pair enumeration.

Usage:  python tools/recall_at_scale.py [n_docs]   (default 600000;
        builds/reuses the bench corpus cache under /tmp)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int) -> int:
    os.environ.setdefault("GRAFT_BENCH_DOCS", str(n_docs))
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq
    import ray.data as rd

    from bench import ensure_pages_corpus
    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.dupe import dupe_clusters

    pages = ensure_pages_corpus()
    assign = dupe_clusters(
        rd.read_parquet(pages, columns=["url", "text"]), DedupConfig(),
        mapping_ds=rd.read_parquet(pages, columns=["url"]),
    ).to_pandas()
    truth = pq.read_table(
        os.path.join(os.path.dirname(pages), "truth.parquet")
    ).to_pandas()
    m = truth.merge(assign, on="url", how="inner",
                    suffixes=("_true", "_pred"))
    worst = 1.0
    for kind in sorted(m["kind"].unique()):
        sub = m[m["kind"] == kind]
        num = den = 0
        for _, g in sub.groupby("cluster_id_true"):
            n = len(g)
            if n < 2:
                continue
            den += n * (n - 1) // 2
            vc = g["cluster_id_pred"].value_counts()
            num += int((vc * (vc - 1) // 2).sum())
        if den:
            r = num / den
            worst = min(worst, r)
            print(f"recall[{kind}]: {num}/{den} = {r:.5f}")
    ray.shutdown()
    print(f"worst-kind recall: {worst:.5f} (bar: >= 0.99)")
    return 0 if worst >= 0.99 else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 600000))
