"""One-off timing of the round-3 wave-6 operators at a given sf_dir
(default sf0.1) — numbers feed BASELINE.md's wave notes. Each op runs
once on a shared Ray session; consume with count() to execute lazily
built Datasets."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main(sf_dir: str) -> None:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    names = [
        "paragraph_dedup", "temperature_mix", "bm25_scores",
        "bm25_incremental", "phrase_search", "dedup_method_venn",
        "edit_verified_pairs", "content_novelty", "source_quality_report",
        "lexical_semantic_agreement", "top_quality_per_source",
    ]
    out = {}
    for n in names:
        t0 = time.perf_counter()
        res = qs[n](sf_dir)
        if hasattr(res, "count"):
            nrows = res.count()
        else:
            nrows = len(res)
        out[n] = {"sec": round(time.perf_counter() - t0, 2), "rows": int(nrows)}
        print(n, out[n], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "num_cpus": ncpu, "ops": out}))
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
