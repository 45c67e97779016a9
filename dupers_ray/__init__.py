"""dupers_ray — a Ray-Data-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the query/data-processing capabilities of
bengarrett/dupers (reference: /root/reference, Go + bbolt), re-expressed as
``ray.data.Dataset`` pipelines:

- exact content dedup (SHA-256 digests, digest-keyed first-match semantics;
  reference: pkg/dupe/parse/parse.go:217-231, pkg/dupe/dupe.go:919-931)
- MinHash/LSH near-duplicate candidates + verification + connected-components
  clustering (the scaled analogue mandated by BASELINE.json:north_rule)
- substring search over index keys and document text
  (reference: pkg/database/database.go:373-447)
- index maintenance: build/refresh (anti-join), clean, export/import CSV,
  counts/info (reference: pkg/database, pkg/cmd/task)
- training-data extras: SimHash, n-gram Jaccard, text quality stats, language
  ID, embedding similarity search, multimodal stage plumbing.

Library code NEVER calls ray.init()/ray.shutdown(); sessions are owned by
bench.py / tests / the driver.
"""

__version__ = "0.1.0"

__all__ = [
    "DedupConfig",
    "MinHashConfig",
    "ShingleConfig",
    "SimHashConfig",
    "dupe_clusters",
    "dupe_clusters_checkpointed",
    "exact_canonical",
    "exact_dupe_pairs",
    "near_dup_edges",
    "search",
    "synth_pages",
]


def __getattr__(name):
    # lazy re-exports: keep `import dupers_ray` light (no ray.data import
    # cost until a pipeline is actually used)
    if name in ("DedupConfig", "MinHashConfig", "ShingleConfig", "SimHashConfig"):
        from dupers_ray import config

        return getattr(config, name)
    if name in ("dupe_clusters", "dupe_clusters_checkpointed"):
        from dupers_ray.pipelines import dupe

        return getattr(dupe, name)
    if name in ("exact_canonical", "exact_dupe_pairs"):
        from dupers_ray.pipelines import exact_dedup

        return getattr(exact_dedup, name)
    if name == "near_dup_edges":
        from dupers_ray.pipelines.near_dedup import near_dup_edges

        return near_dup_edges
    if name == "search":
        from dupers_ray.pipelines.search import search

        return search
    if name == "synth_pages":
        from dupers_ray.synth import synth_pages

        return synth_pages
    raise AttributeError(name)
