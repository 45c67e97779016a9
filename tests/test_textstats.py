from __future__ import annotations

import numpy as np
import pyarrow as pa

from dupers_ray.stages.filters import sample_hash
from dupers_ray.stages.textstats import (
    fingerprint,
    lang_id,
    quality_stats,
    token_counts,
    top_tokens,
)


def test_token_counts():
    t = pa.table({"text": ["one two three", "", "a,b c", None]})
    out = token_counts(t)
    assert out.column("n_tokens_ws").to_pylist() == [3, 0, 2, 0]
    # BPE-ish: "a" "," "b" "c" = 4 pieces
    assert out.column("n_tokens_bpe").to_pylist() == [3, 0, 4, 0]


def test_quality_stats_ranges():
    t = pa.table(
        {"text": ["The quick brown fox is on the hill and it was there for a day.",
                  "%%% ### @@@ !!!", ""]}
    )
    out = quality_stats(t)
    q = out.column("quality_score").to_pylist()
    assert 0 <= min(q) and max(q) <= 1
    assert q[0] > q[1] > 0 or q[1] == 0  # prose beats punctuation soup
    assert q[2] == 0.0
    assert out.column("n_words").to_pylist()[2] == 0


def test_lang_id():
    t = pa.table(
        {
            "text": [
                "the cat sat on the mat and it was the best of times for all of them",
                "der hund und die katze sind in dem haus mit den kindern und nicht allein",
                "xyzzy plugh qwerty",
                "",
            ]
        }
    )
    out = lang_id(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und", "und"]


def test_fingerprint_order_sensitive_ws_insensitive():
    t = pa.table(
        {"text": ["alpha beta gamma", "alpha  beta\tgamma", "gamma beta alpha", ""]}
    )
    out = fingerprint(t).column("fingerprint").to_pylist()
    assert out[0] == out[1]      # whitespace-insensitive
    assert out[0] != out[2]      # order-sensitive
    assert out[3] != out[0]


def test_top_tokens_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    tbl = pa.table({"text": [
        "b b b a a c", "a a d e", None, "", "c c b", "z y x w v u t s",
    ]})
    out = top_tokens(rd.from_arrow(tbl), k=5).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute("""
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
            FROM documents
        ) GROUP BY token ORDER BY n DESC, token LIMIT 5
    """).df()
    # deterministic (count desc, token asc) order incl. the tie at the cutoff
    assert out.token.tolist() == exp.token.tolist()
    assert out.n.tolist() == exp.n.tolist()


def test_sample_hash_deterministic_and_salted():
    t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    a = sample_hash(t, percent=10)
    b = sample_hash(t, percent=10)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    # rate is approximately right and supersets grow with percent
    assert 350 < a.num_rows < 650
    wider = set(sample_hash(t, percent=20).column("doc_id").to_pylist())
    assert set(a.column("doc_id").to_pylist()) <= wider
    other = set(sample_hash(t, percent=10, salt=1).column("doc_id").to_pylist())
    assert other != set(a.column("doc_id").to_pylist())


def test_assign_split_kernel_and_coherence():
    from dupers_ray.functions.hashing import splitmix64
    from dupers_ray.stages.filters import assign_split

    # docs share cluster ids (simulating near-dup clusters): every doc
    # of a cluster must land in the SAME split, and the label must be
    # exactly the splitmix64 bucket of the cluster id.
    cids = np.array([i // 3 for i in range(3000)], np.int64)
    t = pa.table({
        "doc_id": pa.array(range(3000), pa.int64()),
        "cluster_id": pa.array(cids),
    })
    out = assign_split(t)
    lab = np.array(out.column("split").to_pylist())
    h = splitmix64(cids.astype(np.uint64)) % np.uint64(100)
    exp = np.where(h < 90, "train", np.where(h < 95, "val", "test"))
    assert (lab == exp).all()
    # per-cluster coherence and roughly 90/5/5 fractions
    df = out.to_pandas()
    assert (df.groupby("cluster_id")["split"].nunique() == 1).all()
    frac = df.split.value_counts(normalize=True)
    assert 0.85 < frac["train"] < 0.95
    assert frac.get("val", 0) > 0.01 and frac.get("test", 0) > 0.01


# ------------------------------------------------------ property tests

from hypothesis import given, settings
from hypothesis import strategies as hst

_ASCII = hst.text(
    alphabet=hst.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(hst.lists(hst.one_of(hst.none(), _ASCII), max_size=12))
def test_flat_tokens_matches_python_reference(texts):
    """The Arrow kernel must emit exactly the token stream of
    ``_TOKEN_RE.findall(t.lower())`` per row (ASCII inputs — the regime
    where RE2 and Python `re` classes coincide)."""
    from dupers_ray.stages.textstats import _TOKEN_RE, flat_tokens

    col = pa.array(texts, pa.string())
    flat, parent, n = flat_tokens(col)
    assert n == len(texts)
    got: list[list[str]] = [[] for _ in range(n)]
    for tok, p in zip(flat.to_pylist(), parent):
        got[p].append(tok)
    exp = [_TOKEN_RE.findall(t.lower()) if t else [] for t in texts]
    assert got == exp


@settings(max_examples=100, deadline=None)
@given(hst.lists(hst.one_of(hst.none(), _ASCII), min_size=1, max_size=8))
def test_fingerprint_equals_per_doc_horner(texts):
    """Vectorized Horner fold == the sequential per-doc fold."""
    from dupers_ray.functions.hashing import hash_str_u64, splitmix64
    from dupers_ray.stages.textstats import _TOKEN_RE, fingerprint

    t = pa.table({"text": pa.array(texts, pa.string())})
    got = fingerprint(t).column("fingerprint").to_numpy(zero_copy_only=False)
    mult = np.uint64(0x100000001B3)
    ref = np.zeros(len(texts), np.uint64)
    with np.errstate(over="ignore"):
        for i, txt in enumerate(texts):
            words = _TOKEN_RE.findall((txt or "").lower())
            if not words:
                continue
            acc = np.uint64(0xCBF29CE484222325)
            for v in hash_str_u64(words):
                acc = acc * mult + v
            ref[i] = acc
        ref = splitmix64(ref)
    assert (got == ref).all()


def test_script_stats_rules():
    from dupers_ray.stages.textstats import script_stats

    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [
            "abcdefghi м",      # 9 latin + 1 cyr = exactly 90% → latin
            "abcdefgh мм",      # 8 + 2 → mixed
            "שלום",             # Hebrew: 'other' letters dominate
            "123 !?",           # no letters → none
            None,               # null → none
            "漢字漢字漢字漢字漢字 ab",  # 10 han + 2 latin → mixed (10/12 < 90%)
        ],
    })
    out = script_stats(t)
    assert out.column("script").to_pylist() == [
        "latin", "mixed", "other", "none", "none", "mixed"]
    assert out.column("n_letters").to_pylist() == [10, 10, 4, 0, 0, 12]
    assert out.column("n_han").to_pylist() == [0, 0, 0, 0, 0, 10]


def test_script_stats_synth_roundtrip():
    from dupers_ray.stages.textstats import script_stats
    from dupers_ray.synth import synth_multiscript

    txt = "the quick brown fox jumps over the lazy dog"
    t = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": [txt] * 10,
    })
    ms = synth_multiscript(t)
    out = script_stats(ms, text_col="text_ms")
    lab = out.column("script").to_pylist()
    # doc_id%5: 0 latin, 1 cyrillic, 2 greek, 3 han, 4 half/half=mixed
    assert lab == ["latin", "cyrillic", "greek", "han", "mixed"] * 2
    n_letters = len(txt.replace(" ", ""))
    assert out.column("n_letters").to_pylist() == [n_letters] * 10
