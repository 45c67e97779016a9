"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against the
matching ``oracle_sql()[name]`` via DuckDB. No ray.init()/shutdown() here
or in dupers_ray library code — sessions are owned by the driver, bench.py
and the test fixture.

Engine: dupers_ray — see SURVEY.md §2 for the operator inventory each query
maps to.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import ray.data as rd


def _tbl(sf_dir: str, name: str) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry() -> Any:
    """Flagship: full dupe pipeline (exact digests + MinHash/LSH near-dup +
    connected components) over the sf0.001 documents corpus → one cluster
    assignment per doc (BASELINE.json:north_rule shape)."""
    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.dupe import dupe_clusters

    docs = _tbl("/root/testdata/sf0.001", "documents")
    cfg = DedupConfig(id_col="doc_id", text_col="text")
    return dupe_clusters(docs, cfg)


# ---------------------------------------------------------------- queries

def _q_exact_canonical(sf_dir: str):
    from dupers_ray.pipelines.exact_dedup import exact_canonical

    return exact_canonical(
        _tbl(sf_dir, "documents"), id_col="doc_id", content_col="text"
    )


def _q_exact_pairs(sf_dir: str):
    from dupers_ray.pipelines.exact_dedup import exact_dupe_pairs

    return exact_dupe_pairs(
        _tbl(sf_dir, "documents"), id_col="doc_id", content_col="text"
    )


def _q_exact_pairs_trunc(sf_dir: str):
    """Pairs over prefix-40 content — guarantees real duplicate groups at
    small sf so the pair-emission path is value-checked, not just schema-
    checked (full-text corpus has no exact dups at sf<=0.01)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dupers_ray.pipelines.exact_dedup import exact_dupe_pairs

    docs = _tbl(sf_dir, "documents")

    def trunc(t: "pa.Table") -> "pa.Table":
        cut = pc.utf8_slice_codeunits(t.column("text"), 0, 40)
        return t.set_column(t.column_names.index("text"), "text", cut)

    return exact_dupe_pairs(
        docs.map_batches(trunc, batch_format="pyarrow"),
        id_col="doc_id",
        content_col="text",
    )


def _q_count_by_source(sf_dir: str):
    from dupers_ray.pipelines.maintenance import counts_by_bucket

    return counts_by_bucket(
        _tbl(sf_dir, "documents"), bucket_col="source", size_col="n_chars"
    )


def _q_search_text(sf_dir: str):
    from dupers_ray.pipelines.search import search

    return search(
        _tbl(sf_dir, "documents"), "join", column="text", exact=True,
        keep_cols=["doc_id", "source"],
    )


def _q_search_text_nocase(sf_dir: str):
    from dupers_ray.pipelines.search import search

    return search(
        _tbl(sf_dir, "documents"), "JOIN", column="text", exact=False,
        keep_cols=["doc_id", "source"],
    )


def _mod3_index(docs):
    """Simulated stored index: docs with doc_id % 3 == 0 (deterministic)."""
    import pyarrow as pa

    def f(t: "pa.Table") -> "pa.Table":
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 3 == 0))

    return docs.select_columns(["doc_id"]).map_batches(f, batch_format="pyarrow")


def _q_refresh_anti_broadcast(sf_dir: str):
    """`up` parity: docs not yet in the stored index (index := doc_id%3==0)
    via broadcast key-set anti-join (walkCompare, dupe.go:940-966)."""
    from dupers_ray.pipelines.maintenance import anti_join_broadcast

    docs = _tbl(sf_dir, "documents")
    keys = [
        k
        for batch in _mod3_index(docs).iter_batches(batch_format="pyarrow")
        for k in batch.column("doc_id").to_pylist()
    ]
    return anti_join_broadcast(
        docs.select_columns(["doc_id", "source"]), keys, key_col="doc_id"
    )


def _q_refresh_anti_shuffle(sf_dir: str):
    """Same semantics with the large-side shuffle anti-join path."""
    from dupers_ray.pipelines.maintenance import anti_join_shuffle

    docs = _tbl(sf_dir, "documents")
    return anti_join_shuffle(
        docs.select_columns(["doc_id", "source"]), _mod3_index(docs), key_col="doc_id"
    )


def _q_near_dup_clusters(sf_dir: str):
    """MinHash/LSH + components clusters over documents. Not SQL-expressible
    (iterative graph algorithm) → rows-only driver check; value conformance
    is covered by tests/test_near_dedup.py recall >= 0.99 vs planted truth."""
    from dupers_ray.config import DedupConfig
    from dupers_ray.pipelines.dupe import dupe_clusters

    cfg = DedupConfig(id_col="doc_id", text_col="text")
    return dupe_clusters(_tbl(sf_dir, "documents"), cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_canonical": _q_exact_canonical,
        # NOTE: plain full-text exact pairs is legitimately EMPTY at sf<=0.01
        # (no exact-dup documents); Ray drops zero-row blocks so an empty
        # Dataset loses its schema and would fail the driver's schema check
        # spuriously. The pair path is value-checked by exact_pairs_trunc
        # (same code, prefix-40 digests => real dup groups).
        "exact_pairs_trunc": _q_exact_pairs_trunc,
        "count_by_source": _q_count_by_source,
        "search_text": _q_search_text,
        "search_text_nocase": _q_search_text_nocase,
        "refresh_anti_broadcast": _q_refresh_anti_broadcast,
        "refresh_anti_shuffle": _q_refresh_anti_shuffle,
        "near_dup_clusters": _q_near_dup_clusters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_canonical": """
            SELECT min(doc_id) AS doc_id,
                   sha256(text) AS digest,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
            GROUP BY sha256(text)
        """,
        "exact_pairs_trunc": """
            WITH d AS (
                SELECT doc_id, sha256(substr(text, 1, 40)) AS dg
                FROM documents
                WHERE text IS NOT NULL AND length(text) > 0
            ),
            g AS (SELECT dg, min(doc_id) AS canon FROM d GROUP BY dg)
            SELECT g.canon AS doc_id, d.doc_id AS match_doc_id
            FROM d JOIN g USING (dg)
            WHERE d.doc_id <> g.canon
        """,
        "count_by_source": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS total_bytes
            FROM documents GROUP BY source
        """,
        "search_text": """
            SELECT doc_id, source FROM documents
            WHERE contains(text, 'join') ORDER BY doc_id
        """,
        "search_text_nocase": """
            SELECT doc_id, source FROM documents
            WHERE contains(lower(text), lower('JOIN')) ORDER BY doc_id
        """,
        "refresh_anti_broadcast": """
            SELECT doc_id, source FROM documents WHERE doc_id % 3 <> 0
        """,
        "refresh_anti_shuffle": """
            SELECT doc_id, source FROM documents WHERE doc_id % 3 <> 0
        """,
    }
