"""Cross-document line dedup (stages/linededup.py) vs a brute-force
string-level oracle, plus chunking edge cases."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from dupers_ray.stages.linededup import (
    _doc_lines,
    frequent_lines,
    frequent_lines_by_key,
    remove_duplicate_lines,
    remove_host_boilerplate,
)

BOILER = "cookie notice please accept all cookies to continue reading now"
FOOTER = "copyright twenty twenty four all rights reserved contact us here"


def _corpus() -> pa.Table:
    texts = [
        # 3 docs share BOILER (10 tokens = exactly one chunk)
        BOILER + " unique alpha text one two three four five six seven",
        BOILER + " different body for the second document goes right here",
        "prefix tokens a b c d e f g h " + BOILER,
        # 2 docs share FOOTER
        FOOTER + " body of the fourth document with its own words",
        FOOTER,
        # unique docs, one short (<10 tokens), one empty
        "totally unique words nobody else repeats anywhere at all ever",
        "short doc",
        "",
        # doc repeating BOILER twice internally (counts once per doc)
        BOILER + " middle filler words to pad the chunk grid out " + BOILER,
    ]
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def _brute(table: pa.Table, w: int, min_docs: int):
    texts = table.column("text").to_pylist()
    lines = _doc_lines(texts, w)
    from collections import Counter

    c = Counter()
    for ls in lines:
        for line in set(ls):
            c[line] += 1
    freq = {line for line, n in c.items() if n >= min_docs}
    out = []
    for i, ls in enumerate(lines):
        kept = [s for s in ls if s not in freq]
        out.append(
            {
                "doc_id": i,
                "n_lines": len(ls),
                "n_removed": len(ls) - len(kept),
                "clean_text": " ".join(kept),
            }
        )
    return out, freq


def test_doc_lines_chunking():
    # single-space split parity: empty -> [''], short doc -> one chunk,
    # exact multiple -> no ragged tail
    assert _doc_lines([""], 10) == [[""]]
    assert _doc_lines(["short doc"], 10) == [["short doc"]]
    ten = " ".join(str(i) for i in range(10))
    assert _doc_lines([ten], 10) == [[ten]]
    assert _doc_lines([ten + " tail"], 10) == [[ten, "tail"]]


def test_remove_duplicate_lines_matches_brute():
    table = _corpus()
    exp, freq = _brute(table, 10, 2)
    assert BOILER in freq and FOOTER in freq  # the plant works

    ds = rd.from_arrow(table).repartition(3)
    got = sorted(
        remove_duplicate_lines(ds, tokens_per_line=10, min_docs=2).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert [dict(r) for r in got] == exp
    # doc 8 repeats BOILER twice but the second copy sits off the 10-token
    # grid (9-token filler) — fixed-grid chunking only drops aligned copies
    assert got[8]["n_removed"] == 1


def test_host_boilerplate_scoping():
    """The defining property vs global line dedup: a chunk repeated
    within ONE host is stripped, the same chunk appearing once on each
    of two different hosts is kept."""
    texts = [
        BOILER + " page one of site a with its own unique words here",
        BOILER + " page two of site a gets independent body content too",
        FOOTER,  # site a AND site b each carry FOOTER exactly once
        FOOTER + " site b page whose footer must survive host scoping ok",
        "plain site b page with nothing repeated across any host pages",
    ]
    srcs = ["a", "a", "a", "b", "b"]
    table = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts, "source": srcs}
    )
    ds = rd.from_arrow(table).repartition(3)

    out = sorted(
        remove_host_boilerplate(
            ds, key_col="source", tokens_per_line=10, min_docs=2
        ).take_all(),
        key=lambda r: r["doc_id"],
    )
    # BOILER repeats within host a -> stripped from docs 0 and 1
    assert out[0]["n_removed"] == 1 and BOILER not in out[0]["clean_text"]
    assert out[1]["n_removed"] == 1
    # FOOTER occurs once per host -> kept everywhere (global dedup would
    # strip it: 2 distinct docs corpus-wide)
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == FOOTER
    assert out[3]["n_removed"] == 0 and FOOTER in out[3]["clean_text"]
    g = remove_duplicate_lines(ds, tokens_per_line=10, min_docs=2)
    by_id = {r["doc_id"]: r for r in g.take_all()}
    assert by_id[2]["n_removed"] == 1  # the contrast the test pins

    # frequent set is host-folded: same parametrization, two thresholds
    f2 = frequent_lines_by_key(ds, key_col="source", min_docs=2)
    f3 = frequent_lines_by_key(ds, key_col="source", min_docs=3)
    assert len(f2) == 1 and len(f3) == 0


def test_frequent_lines_threshold():
    ds = rd.from_arrow(_corpus()).repartition(2)
    f2 = frequent_lines(ds, tokens_per_line=10, min_docs=2)
    f3 = frequent_lines(ds, tokens_per_line=10, min_docs=3)
    f9 = frequent_lines(ds, tokens_per_line=10, min_docs=9)
    assert len(f3) < len(f2)  # FOOTER (2 docs) drops out at min_docs=3
    assert len(f9) == 0
    assert np.all(np.diff(f2.view(np.int64)) != 0)  # sorted distinct


# ---------------------------------------------------------------------------
# First-occurrence paragraph dedup (dedup_paragraphs_first)
# ---------------------------------------------------------------------------


def _brute_first_occurrence(table: pa.Table, w: int):
    """Keep only the earliest (doc_id, position) copy of each chunk."""
    texts = table.column("text").to_pylist()
    ids = table.column("doc_id").to_pylist()
    lines = _doc_lines(texts, w)
    seen: set[str] = set()
    out = []
    for i in sorted(range(len(ids)), key=lambda j: ids[j]):
        kept = []
        for s in lines[i]:
            if s in seen:
                continue
            seen.add(s)
            kept.append(s)
        out.append({
            "doc_id": ids[i],
            "n_lines": len(lines[i]),
            "n_removed": len(lines[i]) - len(kept),
            "clean_text": " ".join(kept),
        })
    return sorted(out, key=lambda r: r["doc_id"])


def test_dedup_paragraphs_first_matches_brute():
    from dupers_ray.stages.linededup import dedup_paragraphs_first

    tbl = _corpus()
    got = (
        dedup_paragraphs_first(
            rd.from_arrow(tbl).repartition(3), tokens_per_line=10
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _brute_first_occurrence(tbl, 10)
    assert got.to_dict("records") == exp


def test_first_occurrence_keeps_original_copy():
    """The earliest doc keeps BOILER; every later copy (including the
    in-doc repeat of doc 8) is cut — unlike CCNet line_dedup, which
    drops it everywhere."""
    from dupers_ray.stages.linededup import dedup_paragraphs_first

    got = (
        dedup_paragraphs_first(rd.from_arrow(_corpus()), tokens_per_line=10)
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[0, "clean_text"].startswith(BOILER)
    assert not got.loc[1, "clean_text"].startswith(BOILER)
    # doc 8's leading BOILER chunk is grid-aligned and duplicated -> cut;
    # its trailing copy straddles a chunk boundary and is NOT a dup chunk
    assert not got.loc[8, "clean_text"].startswith(BOILER)
    assert got.loc[8, "n_removed"] == 1
    # CCNet comparison: line_dedup strips BOILER from doc 0 too
    ccnet = (
        remove_duplicate_lines(rd.from_arrow(_corpus()), tokens_per_line=10)
        .to_pandas()
        .set_index("doc_id")
    )
    assert BOILER not in ccnet.loc[0, "clean_text"]


def test_first_occurrence_no_duplicates_is_identity():
    from dupers_ray.stages.linededup import dedup_paragraphs_first

    tbl = pa.table({
        "doc_id": [0, 1],
        "text": ["alpha beta gamma", "delta epsilon zeta"],
    })
    got = (
        dedup_paragraphs_first(rd.from_arrow(tbl), tokens_per_line=10)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["n_removed"].tolist() == [0, 0]
    assert got["clean_text"].tolist() == [
        "alpha beta gamma", "delta epsilon zeta",
    ]


def test_winner_packing_positions():
    """Within one doc the FIRST position wins (position tie-break)."""
    from dupers_ray.stages.linededup import dedup_paragraphs_first

    chunk = "one two three four five six seven eight nine ten"
    tbl = pa.table({"doc_id": [5], "text": [chunk + " " + chunk]})
    got = dedup_paragraphs_first(
        rd.from_arrow(tbl), tokens_per_line=10
    ).to_pandas()
    assert got.loc[0, "n_removed"] == 1
    assert got.loc[0, "clean_text"] == chunk
