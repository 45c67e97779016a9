"""Ingest pipeline: raw pages → filtered → extracted → digested index.

The first half of dupers' flagship DAG (SURVEY.md §3.1 steps 3-5 /
§3.3 `up`): read → skip-filters → extract_text (parity invariant) → drop
the wide html column immediately → digests → index rows, optionally
written as the partitioned index dataset (the bbolt replacement).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dupers_ray.stages.digest import digest_dataset
from dupers_ray.stages.extract import drop_html, extract_text
from dupers_ray.stages.filters import skip_junk


def ingest_pages(
    ds: "ray.data.Dataset",
    *,
    bucket: str = "default",
    url_col: str = "url",
    html_col: str = "html",
    extract: bool = True,
    filter_junk: bool = True,
    batch_size: int = 512,
) -> "ray.data.Dataset":
    """pages (url, html[, ...]) → index rows (bucket, url, digest,
    digest_u64). Extraction is skipped when the corpus already carries the
    parity ``text`` column and extract=False."""
    if filter_junk:
        ds = skip_junk(ds, url_col=url_col)
    if extract:
        ds = ds.map_batches(
            extract_text, fn_kwargs={"html_col": html_col},
            batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
        ).map_batches(
            drop_html, fn_kwargs={"html_col": html_col},
            batch_format="pyarrow", zero_copy_batch=True,
        )
    ds = digest_dataset(ds, content_col="text", batch_size=batch_size)

    def index_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pa.array([bucket] * len(t), pa.string()),
                "url": t.column(url_col),
                "digest": t.column("digest"),
                "digest_u64": t.column("digest_u64"),
            }
        )

    return ds.map_batches(index_rows, batch_format="pyarrow", zero_copy_batch=True)


def ingest_binary_files(
    paths: list[str] | str,
    *,
    bucket: str = "default",
    explode_archive_members: bool = False,
) -> "ray.data.Dataset":
    """True file ingest (dupers' walk, S1): read_binary_files →
    pages-shaped rows (path as url, bytes as html). With
    ``explode_archive_members`` the `up+` behavior: archive rows fan out
    into member rows before hashing (sources/archive.py)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def to_pages(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("path").cast(pa.string()),
                "html": t.column("bytes").cast(pa.binary()),
            }
        )

    ds = ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)
    if explode_archive_members:
        from dupers_ray.sources.archive import explode_archives

        ds = ds.map_batches(
            explode_archives, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=64,  # wide binary rows
        ).select_columns(["url", "html"])
    return ds
