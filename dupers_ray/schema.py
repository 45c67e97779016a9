"""Canonical Arrow schemas for the engine's datasets.

The reference's implicit record shape is ``(path: bytes, sha256: [32]byte)``
inside a bbolt bucket (pkg/database/database.go:28-35). Here every dataset
has an explicit ``pyarrow.Schema``; the primary input is the Common-Crawl
style ``pages`` table from BASELINE.json:input_hint.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json:input_hint). One row ~= one file in a dupers
# bucket: `url` plays the absolute-file-path key, `html` the raw content.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Persisted digest index (~= one bbolt bucket dump, database.go:32-33
# ``Lists map[Filepath][32]byte``). `digest` is lowercase hex (matches
# DuckDB's sha256() output for oracle checks); `digest_u64` is the uniform
# shuffle key (first 8 bytes of the sha256, big-endian).
INDEX_SCHEMA = pa.schema(
    [
        ("bucket", pa.string()),
        ("url", pa.string()),
        ("digest", pa.string()),
        ("digest_u64", pa.uint64()),
    ]
)

# Exact/near dupe pairs: (canonical, duplicate). Mirrors dupers' "only the
# first matching file" output (docs/README.md:198-201) with walk-order
# replaced by deterministic min(url).
PAIRS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),        # canonical (min url in group)
        ("match_url", pa.string()),  # the duplicate
    ]
)

CLUSTERS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cluster_id", pa.uint64()),
    ]
)

MINHASH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("node", pa.uint64()),          # stable 64-bit id of url
        ("sig", pa.binary()),           # num_perm little-endian uint32s
        ("n_shingles", pa.int64()),
    ]
)

BAND_SCHEMA = pa.schema(
    [
        ("band_id", pa.int32()),
        ("band_hash", pa.uint64()),
        ("url", pa.string()),
        ("node", pa.uint64()),
    ]
)
