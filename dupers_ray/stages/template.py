"""DOM template fingerprinting: cluster pages by tag-structure skeleton.

Crawl corpora are dominated by a few thousand page TEMPLATES (CMS themes,
forum software, product-page generators); template-level grouping is the
standard first cut for boilerplate mining and per-site sampling caps
(RefinedWeb §3.1 discusses template-driven boilerplate; the classic
Gibson/Punera/Tomkins "The volume and evolution of web page templates"
measured 40-50% of the web as templated). Engine-new — the reference
(bengarrett/dupers) groups by whole-content SHA-256
(``pkg/dupe/parse/parse.go:217-231``); this is the same identity idea
lifted from raw bytes to DOM STRUCTURE, so near-identical pages that
differ only in text/attributes collapse.

Kernel (all vectorized, SQL-restatable — see the oracle in
__ray_entry__.py):

1. strip inter-tag text:  RE2 ``>[^<]*``  → ``>``
2. casefold the remaining markup (tag names are case-insensitive)
3. strip attributes:      RE2 ``<([a-z][a-z0-9]*)[^>]*>`` → ``<\\1>``

The result is the page's tag skeleton, e.g.
``<html><head><title></head><body><div><h1><p><p></div></body></html>``
(note HTML's optional close tags survive as-is — the skeleton is a
deterministic function of the MARKUP, not a DOM parse; two pages from
the same generator produce byte-identical markup shapes, which is what
the fingerprint keys on). Comments / doctype lose their interior after
step 1 like any other inter-``>`` run; parity with the SQL oracle is
exact because both sides apply the identical three rewrites.

Scale shape: two RE2 global-replaces + one lower per batch (Arrow
kernels, zero Python rows), then the skeleton column is
dictionary-interned so md5 runs once per DISTINCT skeleton per batch —
on a templated corpus that's thousands of hashes for millions of rows.
The rollup ships one (template_u64, count, min_id) row per distinct
template per batch (combiner discipline, same as pipelines/urls.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dupers_ray.functions.hashing import hash_str_u64

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def tag_skeleton(col: "pa.ChunkedArray | pa.Array") -> pa.ChunkedArray:
    """html (binary or string) → tag-skeleton string column."""
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        # post-transcode html is valid UTF-8 (stages/charset); cast is
        # zero-copy (binary and string share the buffer layout).
        col = col.cast(pa.string())
    s = pc.replace_substring_regex(col, pattern=">[^<]*", replacement=">")
    s = pc.utf8_lower(s)
    return pc.replace_substring_regex(
        s, pattern="<([a-z][a-z0-9]*)[^>]*>", replacement=r"<\1>"
    )


def template_key(
    batch: pa.Table,
    *,
    html_col: str = "html",
    out_col: str = "template_u64",
    keep_skeleton: bool = False,
) -> pa.Table:
    """Append ``template_u64`` (md5-u64 of the tag skeleton, interned so
    md5 runs per distinct skeleton) and ``n_tags`` (skeleton tag count)."""
    skel = tag_skeleton(batch.column(html_col))
    if isinstance(skel, pa.ChunkedArray):
        # chunk-wise dictionary_encode would produce chunk-local
        # dictionaries; combine first so codes index ONE dictionary.
        skel = skel.combine_chunks()
    n = len(skel)
    if n:
        enc = skel.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keys = hash_str_u64(enc.dictionary.to_pylist())[codes]
    else:
        keys = np.empty(0, np.uint64)
    n_tags = pc.count_substring(skel, "<")
    batch = batch.append_column(out_col, pa.array(keys))
    batch = batch.append_column("n_tags", n_tags.cast(pa.int64()))
    if keep_skeleton:
        batch = batch.append_column("skeleton", skel)
    return batch


def template_keys(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """→ (doc_id, template_u64, n_tags): per-page template assignment.
    One stateless streaming pass, no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        return template_key(t, html_col=html_col).select(
            [id_col, "template_u64", "n_tags"]
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def template_clusters(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """→ (template_u64, n_pages, exemplar, n_tags): pages per template
    with the deterministic min-id exemplar (the reference's first-match
    survivor rule, ``pkg/dupe/dupe.go:919-931``, applied per template).
    Combiner → small groupby: the shuffle moves one row per distinct
    template per batch, never the corpus."""
    def partial(batch: pa.Table) -> pa.Table:
        t = template_key(batch, html_col=html_col)
        df = t.select([id_col, "template_u64", "n_tags"]).to_pandas()
        # groupby/shuffle on the SIGNED reinterpretation: uint64 keys
        # above 2^63 would fall out of Arrow into pickled-object blocks.
        df["__tk"] = df["template_u64"].to_numpy().view(np.int64)
        gb = df.groupby("__tk", sort=False)
        out = gb[id_col].size().rename("n_pages").to_frame()
        out["exemplar"] = gb[id_col].min()
        # n_tags is constant within a template by construction; Max is a
        # merge-safe way to carry it through the combiner.
        out["n_tags"] = gb["n_tags"].max()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from dupers_ray.functions.grouping import partitioned_aggregate

    # hash-partitioned reduce: distinct templates are data-sized
    agg = partitioned_aggregate(
        partials, "__tk",
        sums=("n_pages",), mins=("exemplar",), maxs=("n_tags",),
    )

    def unsign(t: pa.Table) -> pa.Table:
        keys = t.column("__tk").to_numpy(zero_copy_only=False)
        t = t.drop_columns(["__tk"])
        return t.append_column(
            "template_u64", pa.array(keys.view(np.uint64))
        )

    return agg.map_batches(unsign, batch_format="pyarrow", zero_copy_batch=True)
