"""CSV export/import with dupers interchange-format parity.

Reference format (pkg/database/io.go:88-123 CSVExport, testdata/
export-bucket1.csv): RFC-4180, header line ``sha256_sum,path#<bucket>``
(the bucket name is EMBEDDED in the header), then ``<64-hex>,<relpath>``
rows. Import validates the header and each hex digest
(pkg/database/csv/csv.go:57-76 Bucket/Checker, :79-91 Checksum).

Export streams the Dataset through ``iter_batches`` into one file — this is
a small interchange format, not a data path (the engine's real persistence
is partitioned Parquet; see state/manifest.py).
"""

from __future__ import annotations

import csv
import io
import os
import re

import pyarrow as pa

import ray.data

HEADER_PREFIX = "sha256_sum,path#"
_HEX64 = re.compile(r"^[0-9a-fA-F]{64}$")


def export_csv(
    ds: "ray.data.Dataset",
    bucket: str,
    path: str,
    *,
    url_col: str = "url",
    digest_col: str = "digest",
) -> int:
    """Write one bucket's index rows in dupers export format. Returns row
    count. Rows stream through the driver (small interchange files)."""
    n = 0
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", newline="") as f:
        f.write(f"{HEADER_PREFIX}{bucket}\n")
        w = csv.writer(f)
        for batch in ds.select_columns([digest_col, url_col]).iter_batches(
            batch_format="pyarrow"
        ):
            for dg, url in zip(
                batch.column(digest_col).to_pylist(), batch.column(url_col).to_pylist()
            ):
                w.writerow([dg, url])
                n += 1
    return n


class CSVFormatError(ValueError):
    pass


def import_csv(path: str) -> tuple[str, "ray.data.Dataset"]:
    """Parse a dupers export CSV → (bucket, index Dataset(bucket, url,
    digest, digest_u64)). Raises CSVFormatError on a bad header; rows with
    invalid hex are REJECTED (counted in the error if all rows bad),
    mirroring csv.Import's per-row validation."""
    with open(path, newline="") as f:
        header = f.readline().rstrip("\r\n")
        if not header.startswith(HEADER_PREFIX):
            raise CSVFormatError(
                f"bad header {header[:50]!r}: want {HEADER_PREFIX!r}<bucket>"
            )
        bucket = header[len(HEADER_PREFIX):]
        if not bucket:
            raise CSVFormatError("empty bucket name in header")
        digests: list[str] = []
        urls: list[str] = []
        for row in csv.reader(f):
            if len(row) != 2:
                continue
            dg, url = row
            if not _HEX64.match(dg) or not url:
                continue  # reject invalid rows (csv.go:79-91 strictness)
            digests.append(dg.lower())
            urls.append(url)

    tbl = pa.table(
        {
            "bucket": pa.array([bucket] * len(urls), pa.string()),
            "url": pa.array(urls, pa.string()),
            "digest": pa.array(digests, pa.string()),
        }
    )
    from dupers_ray.functions.hashing import hex_prefix_u64

    tbl = tbl.append_column("digest_u64", pa.array(hex_prefix_u64(digests)))
    return bucket, ray.data.from_arrow(tbl)
