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
