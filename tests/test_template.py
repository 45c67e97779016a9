"""DOM template fingerprinting: skeleton kernel pinned against an
independent per-row re.sub reference, invariance properties, and the
Dataset-level rollup."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from dupers_ray.stages.template import (
    tag_skeleton,
    template_clusters,
    template_key,
    template_keys,
)


def ref_skeleton(html: str) -> str:
    """Independent reference: Python re, same three rewrites."""
    s = re.sub(r">[^<]*", ">", html)
    s = s.lower()
    return re.sub(r"<([a-z][a-z0-9]*)[^>]*>", r"<\1>", s)


MESSY = [
    # uppercase tags + multi-line attribute
    '<HTML><BODY><DIV class="a"\n  id="x1">Hi\nthere</DIV></BODY></HTML>',
    # self-closing void elements, comment, doctype
    "<!DOCTYPE html><html><head><!-- note --><meta charset='u'/></head>"
    "<body><br/><img src='i.png'/>tail text</body></html>",
    # same structure as row 0, different text/attrs -> same template
    '<html><body><div class="zz" id="q9">Other words</div></body></html>',
    # no tags at all
    "just plain text, no markup",
    # empty string
    "",
]


def test_skeleton_matches_reference():
    got = tag_skeleton(pa.chunked_array([pa.array(MESSY)])).to_pylist()
    assert got == [ref_skeleton(h) for h in MESSY]


def test_same_structure_same_key_different_text_attrs():
    t = template_key(
        pa.table({"doc_id": list(range(len(MESSY))),
                  "html": pa.array([m.encode() for m in MESSY], pa.binary())})
    )
    keys = t.column("template_u64").to_pylist()
    # rows 0 and 2: identical tag structure despite different case,
    # whitespace-in-attrs, attribute values and text
    assert keys[0] == keys[2]
    assert keys[0] != keys[1]
    # key is md5-u64 of the skeleton (oracle parity)
    skel = ref_skeleton(MESSY[0])
    exp = int.from_bytes(hashlib.md5(skel.encode()).digest()[:8], "big")
    assert keys[0] == exp
    # n_tags counts skeleton tags (open + close)
    assert t.column("n_tags").to_pylist()[3] == 0


def test_rollup_counts_and_exemplar():
    n = 90
    htmls = []
    for i in range(n):
        k = i % 3
        if k == 0:
            htmls.append(f'<html><body><p id="p{i}">x{i}</p></body></html>')
        elif k == 1:
            htmls.append(f"<html><body><ul><li>a{i}</li></ul></body></html>")
        else:
            htmls.append(f'<html><body><table border="{i}"><tr><td>{i}'
                         f"</td></tr></table></body></html>")
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(n)),
        "html": pa.array([h.encode() for h in htmls], pa.binary()),
    })).repartition(4)

    out = template_clusters(ds).to_pandas()
    assert len(out) == 3
    assert sorted(out["n_pages"]) == [30, 30, 30]
    assert sorted(out["exemplar"]) == [0, 1, 2]

    keys = template_keys(ds).to_pandas()
    assert len(keys) == n
    # per-doc assignment agrees with the rollup membership counts
    vc = keys.groupby("template_u64")["doc_id"].count()
    assert sorted(vc) == [30, 30, 30]
    assert set(vc.index) == set(out["template_u64"])


def test_batch_invariance():
    """Fingerprints don't depend on batching/chunk layout (interning is
    per-batch but md5 is content-only)."""
    tbl = pa.table({
        "doc_id": list(range(len(MESSY))),
        "html": pa.array([m.encode() for m in MESSY], pa.binary()),
    })
    one = template_key(tbl).column("template_u64").to_pylist()
    chunked = pa.Table.from_batches(tbl.to_batches(max_chunksize=2))
    two = template_key(chunked).column("template_u64").to_pylist()
    assert one == two
    rows = [
        template_key(tbl.slice(i, 1)).column("template_u64").to_pylist()[0]
        for i in range(len(MESSY))
    ]
    assert rows == one
    assert np.asarray(one).dtype == np.asarray(rows).dtype
