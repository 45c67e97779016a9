"""Text analysis stages for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are stateless vectorized ``map_batches`` transforms (regexes and
stopword tables are module-level constants — compiled once per worker
process at import). The reference has no text analytics (it hashes bytes);
these are the engine-side additions the 100 TB training-data use case needs
(task brief: "Beyond the reference's own operators...").
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dupers_ray.functions.hashing import hash_str_u64, splitmix64

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer regex family, simplified to stdlib `re`)
_BPEISH_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# small public stopword lists per language (top function words)
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on was with as be at by this have from or an".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al es".split()),
    "it": frozenset("di e il la che in a per è un del con non una sono da si le dei".split()),
}


def token_counts(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens_ws`` (whitespace split) and ``n_tokens_bpe``
    (BPE-ish pre-tokenizer pieces). Pure Arrow RE2 count kernels — the
    same regex engine the DuckDB oracle runs, so the counts agree by
    construction (the Python `re` loop this replaced differed on
    non-ASCII whitespace/digit classes)."""
    col = batch.column(text_col)
    ws = pc.fill_null(pc.count_substring_regex(col, r"\S+"), 0)
    bpe = pc.fill_null(
        pc.count_substring_regex(col, r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), 0
    )
    return batch.append_column(
        "n_tokens_ws", ws.cast(pa.int64())
    ).append_column("n_tokens_bpe", bpe.cast(pa.int64()))


def quality_stats(batch: pa.Table, *, text_col: str = "text", lang: str = "en") -> pa.Table:
    """Append quality signals: n_chars, word count, mean word length,
    punctuation ratio, stopword ratio, alpha ratio, and a composite
    ``quality_score`` in [0,1] (C4/Gopher-style heuristics). All counts
    come from Arrow RE2 kernels + one flat_tokens pass; the ratios divide
    the same integers the per-row loop produced."""
    col = batch.column(text_col)
    stop = _STOPWORDS.get(lang, _STOPWORDS["en"])
    n = len(col)
    n_chars = pc.fill_null(pc.utf8_length(col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n_punct = pc.fill_null(
        pc.count_substring_regex(col, r"[^\w\s]"), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha_ch = pc.fill_null(
        pc.count_substring_regex(col, r"[A-Za-z]"), 0
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    flat, parent, _ = flat_tokens(col)
    n_words = np.bincount(parent, minlength=n).astype(np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u_len = pc.utf8_length(enc.dictionary).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        u_stop = pc.is_in(
            enc.dictionary, value_set=pa.array(sorted(stop), pa.string())
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sum_wl = np.bincount(parent, weights=u_len[inv], minlength=n)
        n_stop = np.bincount(parent, weights=u_stop[inv], minlength=n)
    else:
        sum_wl = np.zeros(n, np.float64)
        n_stop = np.zeros(n, np.float64)
    mean_wl = np.where(n_words > 0, sum_wl / np.maximum(1, n_words), 0.0)
    punct_r = n_punct / np.maximum(1, n_chars)
    stop_r = n_stop / np.maximum(1, n_words)
    alpha_r = n_alpha_ch / np.maximum(1, n_chars)
    # composite: reward stopword presence + sane word lengths, punish
    # punctuation soup and empty docs
    score = np.clip(
        0.4 * np.clip(stop_r / 0.3, 0, 1)
        + 0.3 * np.clip(alpha_r, 0, 1)
        + 0.3 * np.clip(1 - np.abs(mean_wl - 5.0) / 5.0, 0, 1),
        0,
        1,
    )
    score = np.where(n_words == 0, 0.0, score)
    out = batch
    for name, arr in [
        ("n_chars_q", n_chars), ("n_words", n_words), ("mean_word_len", mean_wl),
        ("punct_ratio", punct_r), ("stopword_ratio", stop_r),
        ("alpha_ratio", alpha_r), ("quality_score", score),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


def lang_id(batch: pa.Table, *, text_col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """Heuristic language ID: argmax of per-language stopword hit-rate
    (n-gram-free, deterministic; 'und' = undetermined when no evidence).
    Vectorized: flat_tokens + one ``is_in`` per language over the batch
    dictionary, hit counts via bincount; argmax with first-language-wins
    ties and the ``max(2, n_words // 50)`` evidence threshold — the same
    contract the SQL oracle restates."""
    langs = list(_STOPWORDS)
    flat, parent, n = flat_tokens(batch.column(text_col))
    if not len(flat):
        return batch.append_column(out_col, pa.array(["und"] * n, pa.string()))
    enc = flat.dictionary_encode()
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.bincount(parent, minlength=n).astype(np.int64)
    hits = np.empty((len(langs), n), np.int64)
    for li, lg in enumerate(langs):
        u_in = pc.is_in(
            enc.dictionary,
            value_set=pa.array(sorted(_STOPWORDS[lg]), pa.string()),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        hits[li] = np.bincount(parent, weights=u_in[inv], minlength=n)
    best_li = hits.argmax(axis=0)          # first (dict-order) lang wins ties
    best_hits = hits[best_li, np.arange(n)]
    ok = (best_hits > 0) & (best_hits >= np.maximum(2, n_words // 50))
    preds = np.where(ok, np.asarray(langs, dtype=object)[best_li], "und")
    return batch.append_column(out_col, pa.array(preds, pa.string()))


def fingerprint(batch: pa.Table, *, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """64-bit rolling-hash document fingerprint: order-sensitive mix of the
    token hash sequence (Karp-Rabin style). Whitespace-insensitive but
    word-order-sensitive — unlike the exact digest (byte-sensitive) and the
    MinHash signature (order-insensitive).

    Vectorized Horner: for a doc with token hashes v_1..v_m the fold
    acc = (..(OFFSET*P + v_1)*P + v_2..) equals OFFSET*P^m + Σ v_i·P^(m-i)
    (mod 2^64), so one powers table + per-occurrence multiply +
    ``np.add.reduceat`` segment sums replace the per-doc Python loop;
    md5 runs once per DISTINCT token via dictionary interning. The token
    class is the oracle's own ``[a-z0-9_]+`` (flat_tokens), which the
    per-row ``\\w+`` loop this replaced only matched on ASCII."""
    col = batch.column(text_col)
    n = len(col)
    mult = np.uint64(0x100000001B3)
    flat, parent, _ = flat_tokens(col)
    out = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        if len(flat):
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            h = hash_str_u64(enc.dictionary.to_pylist())[codes]
            lens = np.bincount(parent, minlength=n).astype(np.int64)
            # P^0..P^max(m) mod 2^64 (uint64 multiply wraps)
            pows = np.empty(int(lens.max()) + 1, np.uint64)
            pows[0] = np.uint64(1)
            for k in range(1, len(pows)):
                pows[k] = pows[k - 1] * mult
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = np.arange(len(h), dtype=np.int64) - np.repeat(starts, lens)
            terms = h * pows[np.repeat(lens, lens) - 1 - pos]
            nz = lens > 0
            sums = np.add.reduceat(terms, starts[nz])
            out[nz] = np.uint64(0xCBF29CE484222325) * pows[lens[nz]] + sums
        out = splitmix64(out)
    return batch.append_column(out_col, pa.array(out))


_TOKEN_RE = re.compile(r"[a-z0-9_]+")


def flat_tokens(col) -> tuple[pa.Array, np.ndarray, int]:
    """C-speed tokenizer: Arrow ``utf8_lower`` + ``split_pattern_regex``
    on the complement class — the token stream of
    ``_TOKEN_RE.findall(text.lower())`` (split on non-token runs, drop
    the empty edge pieces), with no per-row Python. Returns (flat token
    StringArray, doc index per token, n_docs); null rows contribute no
    tokens. Case folding is utf8proc's simple mapping, which matches
    DuckDB's ``lower()`` exactly (verified: 'İstanbul' → 'istanbul' in
    both) where Python ``str.lower`` inserts a combining dot — i.e. this
    path is *closer* to the SQL oracle contract than the Python loop it
    replaced; they differ only on such exotic case-folds (test corpora
    are ASCII)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lists = pc.split_pattern_regex(pc.utf8_lower(col), "[^a-z0-9_]+")
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    lens = np.where(np.isnan(lens.astype(np.float64)), 0, lens).astype(np.int64) \
        if lens.dtype != np.int64 else lens
    flat = lists.flatten()  # concat of non-null lists, row order preserved
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.all():
        flat = flat.filter(keep)
        parent = parent[keep_np]
    return flat, parent, n


def partial_token_counts(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-batch term-frequency combiner: tokenize (lowercased
    ``[a-z0-9_]+`` runs, the same class the n-gram/fingerprint oracles
    restate in SQL) and pre-aggregate counts INSIDE the batch, so the
    downstream groupby shuffles one row per distinct token per batch —
    bounded by batch vocabulary, not corpus token count. At web scale the
    shuffle moves ~|vocab|·n_blocks short rows instead of ~10^15 tokens.
    Tokenize + count are pure Arrow kernels (flat_tokens + value_counts)."""
    flat, _, _ = flat_tokens(batch.column(text_col))
    if not len(flat):
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    vc = flat.value_counts()
    return pa.table({"token": vc.field("values"),
                     "n": vc.field("counts").cast(pa.int64())})


def top_tokens(ds, *, k: int = 100, text_col: str = "text"):
    """Corpus-wide top-k frequent tokens: per-batch combiner →
    ``groupby(token).sum`` (the only all-to-all, over pre-aggregated
    vocabulary rows) → deterministic top-k ordered by (count desc, token
    asc) so cutoff ties are stable across runs and engines.

    The post-aggregation table is vocabulary-sized (≪ corpus) but still
    unbounded (10^8+ distinct tokens at web scale), so the top-k is a
    per-block combiner → one k·n_blocks-row merge, never a global sort."""
    parts = ds.map_batches(
        partial_token_counts, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col}, zero_copy_batch=True,
    )
    from dupers_ray.functions.grouping import partitioned_aggregate
    from dupers_ray.stages.filters import global_top_k

    # hash-partitioned reduce: groupby on STRING tokens is a global string
    # sort over every partial row; partitioning hashes the strings instead
    agg = partitioned_aggregate(parts, "token", sums=("n",))
    return global_top_k(agg, by=[("n", False), ("token", True)], k=k)


# ---------------------------------------------------------------- scripts

# Unicode-script letter classes (RE2 property classes — identical
# semantics in Arrow and DuckDB, probed at build time). 'other' is any
# \p{L} letter outside the four tracked scripts.
SCRIPT_CLASSES = (
    ("latin", r"\p{Latin}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("greek", r"\p{Greek}"),
    ("han", r"\p{Han}"),
)


def script_stats(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text",
) -> pa.Table:
    """Per-doc Unicode-script histogram + dominant-script label — the
    curation axis orthogonal to language ID (a doc can claim lang=en
    while its LETTERS are Cyrillic homoglyph spam, the classic
    search-spam trick). Counts letters per script with one RE2
    ``count_substring_regex`` per class (vectorized, no Python rows);
    ``script`` is the argmax class when it holds >= 90% of all letters
    (integer rule: max*10 >= total*9), else 'mixed'; letterless docs
    are 'none'. Ties break by the fixed class order above, 'other'
    last — all restatable in SQL."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    counts = {
        name: pc.count_substring_regex(text, pat)
        .to_numpy(zero_copy_only=False).astype(np.int64)
        for name, pat in SCRIPT_CLASSES
    }
    total = (pc.count_substring_regex(text, r"\p{L}")
             .to_numpy(zero_copy_only=False).astype(np.int64))
    counts["other"] = total - sum(counts.values())
    names = list(counts)
    mat = np.stack([counts[n] for n in names])          # (5, n_rows)
    best = mat.argmax(axis=0)                           # first max wins
    bestc = mat.max(axis=0)
    lab = np.array(names, dtype=object)[best]
    lab = np.where(bestc * 10 >= total * 9, lab, "mixed")
    lab = np.where(total == 0, "none", lab)
    return pa.table({
        id_col: batch.column(id_col),
        "n_latin": pa.array(counts["latin"]),
        "n_cyrillic": pa.array(counts["cyrillic"]),
        "n_greek": pa.array(counts["greek"]),
        "n_han": pa.array(counts["han"]),
        "n_letters": pa.array(total),
        "script": pa.array(list(lab), pa.string()),
    })
