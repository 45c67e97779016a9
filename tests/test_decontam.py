"""Decontamination (pipelines/decontam.py) + per-group cap (filters)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dupers_ray.pipelines.decontam import decontaminate
from dupers_ray.stages.filters import cap_per_group

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(rng, n):
    return " ".join(rng.choice(WORDS, n))


def test_decontaminate_planted(ray_session):
    block = pa.table({"doc_id": [100], "text": ["alpha beta gamma delta epsilon zeta"]})
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": [
            "alpha beta gamma delta epsilon zeta",     # identical -> out
            "xx yy alpha beta gamma delta epsilon zz",  # shares a 5-gram -> out
            "kappa iota theta eta zeta",                # disjoint 5-gram -> kept
            "",                                         # empty -> kept
            "alpha beta",                               # short, != any block short shingle -> kept
        ],
    })
    out = decontaminate(rd.from_arrow(docs), rd.from_arrow(block)).to_pandas()
    assert sorted(out.doc_id.tolist()) == [2, 3, 4]


def test_decontaminate_short_doc_exact_match(ray_session):
    block = pa.table({"doc_id": [9], "text": ["alpha beta"]})  # <k: whole-text shingle
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["alpha beta", "alpha beta gamma"],
    })
    out = decontaminate(rd.from_arrow(docs), rd.from_arrow(block)).to_pandas()
    # doc 0 == the short blocklist shingle; doc 1's shingles are 3-token-full
    # text (also <k) which differs
    assert out.doc_id.tolist() == [1]


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_decontaminate_matches_duckdb(ray_session, strategy):
    rng = np.random.default_rng(13)
    docs = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": [_doc(rng, int(rng.integers(2, 30))) for _ in range(300)],
    })
    block = pa.table({
        "doc_id": pa.array(range(1000, 1020), pa.int64()),
        "text": [_doc(rng, int(rng.integers(2, 30))) for _ in range(20)],
    })
    out = decontaminate(
        rd.from_arrow(docs), rd.from_arrow(block), strategy=strategy,
        num_partitions=8,
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    con.register("block", block)
    exp = con.execute(r"""
        WITH sh AS (
            SELECT doc_id, tk,
                CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(tk) < 5 THEN [array_to_string(tk, chr(31))]
                     ELSE list_distinct([array_to_string(tk[i:i+4], chr(31))
                                         FOR i IN range(1, len(tk) - 3)])
                END AS grams
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
                  FROM documents)
        ), bsh AS (
            SELECT DISTINCT unnest(
                CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                     WHEN len(tk) < 5 THEN [array_to_string(tk, chr(31))]
                     ELSE list_distinct([array_to_string(tk[i:i+4], chr(31))
                                         FOR i IN range(1, len(tk) - 3)])
                END) AS g
            FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
                  FROM block)
        )
        SELECT s.doc_id FROM sh s
        WHERE NOT EXISTS (
            SELECT 1 FROM bsh WHERE list_contains(s.grams, bsh.g)
        )
        ORDER BY s.doc_id
    """).df()
    assert sorted(out.doc_id.tolist()) == exp.doc_id.tolist()


def test_cap_per_group_matches_duckdb(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n), pa.int64()),
        "source": pa.array([f"s{i % 13}" for i in range(n)], pa.string()),
    })
    out = cap_per_group(
        rd.from_arrow(t).repartition(7), group_col="source",
        order_col="doc_id", n=10,
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT doc_id, source FROM (
            SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM t
        ) WHERE rn <= 10 ORDER BY source, doc_id
    """).df()
    got = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.source.tolist() == exp.source.tolist()


# ----------------------------------------------------- near decontamination


def _brute_near_contaminated(corpus_texts, block_texts, thr=0.6):
    """Reference: corpus doc is contaminated iff it shares >=1 LSH band
    hash with a blocklist doc AND their uint16 signature-fold agreement
    reaches thr — the operator's exact contract."""
    from dupers_ray.config import MinHashConfig, ShingleConfig
    from dupers_ray.functions.hashing import mix_rows_u64
    from dupers_ray.stages.minhash import MinHasher

    mcfg = MinHashConfig()
    mh = MinHasher(shingle=ShingleConfig(), minhash=mcfg)

    def sigs(texts):
        s, n = mh.signatures([t or "" for t in texts])
        return s, n

    def bands_of(sig):
        d = sig.shape[0]
        m = sig.reshape(d, mcfg.bands, mcfg.rows).astype(np.uint64)
        out = np.empty((d, mcfg.bands), np.uint64)
        with np.errstate(over="ignore"):
            for b in range(mcfg.bands):
                out[:, b] = mix_rows_u64(m[:, b, :] + np.uint64(b + 1))
        return out

    cs, cn = sigs(corpus_texts)
    bs, bn = sigs(block_texts)
    if not bs.shape[0]:
        return set()
    cbands, bbands = bands_of(cs), bands_of(bs)
    cf = (cs & np.uint32(0xFFFF)).astype(np.uint16)
    bf = (bs & np.uint32(0xFFFF)).astype(np.uint16)
    corpus_rows = np.flatnonzero(cn > 0)
    bad = set()
    for i in range(cs.shape[0]):
        for j in range(bs.shape[0]):
            if np.intersect1d(cbands[i], bbands[j]).size and \
               (cf[i] == bf[j]).mean() >= thr:
                bad.add(int(corpus_rows[i]))
                break
    return bad


def test_near_decontaminate_planted(ray_session):
    from dupers_ray.pipelines.decontam import near_decontaminate

    rng = np.random.default_rng(7)
    base = " ".join(rng.choice(WORDS, 120))
    toks = base.split()
    perturbed = toks[:]
    perturbed[5] = "zzz"          # 1 of 120 tokens changed -> near-dup
    block = pa.table({
        "doc_id": pa.array([1000], pa.int64()), "text": [base],
    })
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            base,                          # exact copy -> dropped
            " ".join(perturbed),           # near copy -> dropped
            " ".join(rng.choice(WORDS, 120)),  # unrelated -> kept
            "",                            # no shingles -> kept
        ],
    })
    out = near_decontaminate(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block)
    ).to_pandas()
    assert sorted(out.doc_id.tolist()) == [2, 3]


def test_near_decontaminate_matches_bruteforce(ray_session):
    from dupers_ray.pipelines.decontam import near_decontaminate

    rng = np.random.default_rng(23)
    block_texts = [" ".join(rng.choice(WORDS, int(rng.integers(20, 60))))
                   for _ in range(10)]
    corpus_texts = []
    for i in range(80):
        r = rng.random()
        if r < 0.3:   # near-copy of a blocklist doc
            toks = block_texts[int(rng.integers(len(block_texts)))].split()
            k = int(rng.integers(0, 3))
            for _ in range(k):
                toks[int(rng.integers(len(toks)))] = "q" + str(int(rng.integers(9)))
            corpus_texts.append(" ".join(toks))
        elif r < 0.4:
            corpus_texts.append("")       # shingle-less
        else:
            corpus_texts.append(" ".join(rng.choice(WORDS, int(rng.integers(10, 60)))))
    docs = pa.table({
        "doc_id": pa.array(range(len(corpus_texts)), pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    })
    block = pa.table({
        "doc_id": pa.array(range(500, 500 + len(block_texts)), pa.int64()),
        "text": pa.array(block_texts, pa.string()),
    })
    out = near_decontaminate(
        rd.from_arrow(docs).repartition(4), rd.from_arrow(block)
    ).to_pandas()
    bad = _brute_near_contaminated(corpus_texts, block_texts)
    expected = sorted(set(range(len(corpus_texts))) - bad)
    assert sorted(out.doc_id.tolist()) == expected
    assert len(bad) > 5  # the plant actually exercised the drop path


def test_near_decontaminate_empty_blocklist(ray_session):
    from dupers_ray.pipelines.decontam import near_decontaminate

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta", "kappa iota"],
    })
    block = pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
    })
    out = near_decontaminate(rd.from_arrow(docs), rd.from_arrow(block)).to_pandas()
    assert sorted(out.doc_id.tolist()) == [0, 1]


def test_near_decontaminate_join_equals_broadcast(ray_session):
    from dupers_ray.pipelines.decontam import near_decontaminate

    rng = np.random.default_rng(31)
    block_texts = [" ".join(rng.choice(WORDS, int(rng.integers(20, 60))))
                   for _ in range(8)]
    corpus_texts = []
    for _ in range(60):
        if rng.random() < 0.3:
            toks = block_texts[int(rng.integers(len(block_texts)))].split()
            toks[int(rng.integers(len(toks)))] = "qq"
            corpus_texts.append(" ".join(toks))
        else:
            corpus_texts.append(
                " ".join(rng.choice(WORDS, int(rng.integers(10, 60))))
            )
    docs = pa.table({
        "doc_id": pa.array(range(len(corpus_texts)), pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    })
    block = pa.table({
        "doc_id": pa.array(range(900, 900 + len(block_texts)), pa.int64()),
        "text": pa.array(block_texts, pa.string()),
    })
    bc = near_decontaminate(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block)
    ).to_pandas()
    jn = near_decontaminate(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block),
        strategy="join",
    ).to_pandas()
    assert sorted(bc.doc_id) == sorted(jn.doc_id)
    assert len(bc) < len(corpus_texts)  # something was dropped


def test_near_contamination_report_consistent_with_filter(ray_session):
    from dupers_ray.pipelines.decontam import (
        near_contamination_report,
        near_decontaminate,
    )

    rng = np.random.default_rng(17)
    block_texts = [" ".join(rng.choice(WORDS, 40)) for _ in range(5)]
    corpus_texts = []
    for i in range(50):
        if i % 3 == 0:
            toks = block_texts[i % len(block_texts)].split()
            toks[i % len(toks)] = "zz"
            corpus_texts.append(" ".join(toks))
        else:
            corpus_texts.append(" ".join(rng.choice(WORDS, 35)))
    docs = pa.table({
        "doc_id": pa.array(range(len(corpus_texts)), pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    })
    block = pa.table({
        "doc_id": pa.array(range(700, 705), pa.int64()),
        "text": pa.array(block_texts, pa.string()),
    })
    rep = near_contamination_report(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block)
    ).to_pandas()
    kept = near_decontaminate(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block)
    ).to_pandas()
    # reported docs == exactly the docs the filter dropped
    dropped = set(range(len(corpus_texts))) - set(kept.doc_id)
    assert set(rep.doc_id) == dropped
    assert len(rep) > 0
    # agreement counts respect the threshold (0.6 * 128)
    assert (rep.n_agree >= int(0.6 * 128)).all()
    assert rep.block_id.between(700, 704).all()


def test_substring_decontaminate_planted(ray_session):
    from dupers_ray.pipelines.decontam import substring_decontaminate

    rng = np.random.default_rng(41)
    quote = " ".join(rng.choice(WORDS, 30))           # >= k+2 tokens
    short = "alpha beta"                              # < k+2: direct path
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [
            "intro words " + quote + " trailing words",   # contains quote
            quote,                                        # equals quote
            " ".join(rng.choice(WORDS, 40)),              # unrelated
            "xx " + short + " yy",                        # contains short
            "",                                           # empty
            None,                                         # null
        ],
    })
    block = pa.table({
        "doc_id": pa.array([100, 101, 102], pa.int64()),
        "text": pa.array([quote, short, ""], pa.string()),  # '' never hits
    })
    out = substring_decontaminate(
        rd.from_arrow(docs).repartition(3), rd.from_arrow(block)
    ).to_pandas()
    assert sorted(out.doc_id.tolist()) == [2, 4, 5]


def test_substring_decontaminate_matches_duckdb(ray_session):
    import duckdb

    from dupers_ray.pipelines.decontam import substring_decontaminate

    rng = np.random.default_rng(43)
    texts = []
    for i in range(120):
        body = " ".join(rng.choice(WORDS, int(rng.integers(8, 50))))
        texts.append(body)
    # plant quotes: corpus doc i (i%4==1) contains block doc i+3 (%4==0)
    for i in range(1, 30, 4):
        texts[i] = texts[i] + " " + texts[i + 3] + " tail"
    docs_tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    corpus = [(i, t) for i, t in enumerate(texts) if i % 4 != 0]
    block = [(i, t) for i, t in enumerate(texts) if i % 4 == 0]
    c_tbl = pa.table({
        "doc_id": pa.array([i for i, _ in corpus], pa.int64()),
        "text": pa.array([t for _, t in corpus], pa.string()),
    })
    b_tbl = pa.table({
        "doc_id": pa.array([i for i, _ in block], pa.int64()),
        "text": pa.array([t for _, t in block], pa.string()),
    })
    out = substring_decontaminate(
        rd.from_arrow(c_tbl).repartition(4), rd.from_arrow(b_tbl)
    ).to_pandas()
    con = duckdb.connect()
    con.register("c", c_tbl)
    con.register("b", b_tbl)
    exp = con.execute("""
        SELECT doc_id FROM c d WHERE NOT EXISTS (
            SELECT 1 FROM b WHERE b.text IS NOT NULL AND length(b.text) > 0
              AND position(b.text IN d.text) > 0)
        ORDER BY doc_id
    """).df()
    assert sorted(out.doc_id.tolist()) == exp.doc_id.tolist()
    assert len(out) < len(corpus)  # plants actually dropped something
