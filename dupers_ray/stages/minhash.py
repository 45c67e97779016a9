"""MinHash signatures + LSH banding — the near-dup analogue of ``parse.Read``.

The reference detects only EXACT content duplicates (full-file SHA-256,
pkg/dupe/parse/parse.go:217-231). BASELINE.json:north_rule mandates the
scaled near-duplicate generalization: k-shingle → MinHash signature → LSH
band buckets → candidate pairs (Broder's MinHash / banded LSH as described
in the published literature, e.g. Mining of Massive Datasets ch.3).

``MinHasher`` is a STATEFUL actor-pool stage: permutation parameters and
the compiled tokenizer are built once per actor in ``__init__`` and reused
per batch (SURVEY.md §2.3 ST2). All per-batch math is vectorized numpy:

- tokens are hashed once per *unique* token in the batch (np.unique folds
  the batch vocabulary), shingle hashes are a rolling polynomial over the
  flattened token-hash array, and signatures come from perm-chunked
  ``np.minimum.reduceat`` over per-doc segments — no Python loop over
  shingles or permutations per doc.
- universal hash family h_i(x) = (a_i*x + b_i) mod (2^31-1) over 32-bit
  folded shingle hashes: a_i*x + b_i < 2^63 so everything stays in uint64
  without 128-bit tricks. Signature values are uint32.

Docs with zero tokens produce NO signature row (a contentless page cannot
near-dup; exact dedup upstream already handles byte-equal empties).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from dupers_ray.config import MinHashConfig, ShingleConfig
from dupers_ray.functions.hashing import hash_str_u64, mix_rows_u64, node_ids, splitmix64

_P31 = np.uint64((1 << 31) - 1)  # Mersenne prime 2^31-1
_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier for shingle rolling hash


class MinHasher:
    """map_batches(MinHasher, concurrency=N) — emits one signature row per
    doc with >=1 token: (id_col, node, sig: list<uint32>, n_shingles)."""

    def __init__(
        self,
        shingle: ShingleConfig | None = None,
        minhash: MinHashConfig | None = None,
        *,
        id_col: str = "url",
        text_col: str = "text",
    ):
        self.shingle = shingle or ShingleConfig()
        self.cfg = minhash or MinHashConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.tok = re.compile(self.shingle.token_pattern, re.UNICODE)
        rng = np.random.default_rng(self.cfg.seed)
        # a in [1, p), b in [0, p) — classic universal family
        self.a = rng.integers(1, int(_P31), size=self.cfg.num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_P31), size=self.cfg.num_perm, dtype=np.uint64)

    # ---------------------------------------------------------------- core

    def _shingle_hashes(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Returns (flat shingle-hash array uint64, per-doc segment offsets
        int64 of length len(texts)+1). Docs with 0 tokens get empty segments.

        Fully batch-vectorized: tokens are interned through a dict (object
        argsort via np.unique cost ~0.3ms/doc — the dict is ~10x cheaper),
        the k-token rolling polynomial runs ONCE over the flattened token
        array, and per-doc windows are selected with a gather index, so no
        numpy call is issued per document."""
        k = self.shingle.k
        counts = np.empty(len(texts), np.int64)
        findall = self.tok.findall
        lower = self.shingle.lowercase
        all_toks: list[str] = []
        ext = all_toks.extend
        for i, t in enumerate(texts):
            s = t if t is not None else ""
            if lower:
                s = s.lower()
            toks = findall(s)
            counts[i] = len(toks)
            ext(toks)

        offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        n_tok = offsets[-1]
        if n_tok == 0:
            return np.empty(0, np.uint64), offsets

        # intern at C speed: factorize(sort=False) assigns codes in first-
        # appearance order (same result as a dict-setdefault loop, measured
        # ~6x cheaper); each UNIQUE token is hashed once
        codes_arr, uniq = pd.factorize(
            np.asarray(all_toks, dtype=object), sort=False
        )
        uniq_h = hash_str_u64(list(uniq))
        tok_h = uniq_h[codes_arr]

        # shingles per doc: n-k+1 for n>=k, 1 for 0<n<k (whole-doc shingle)
        m = np.where(counts >= k, counts - k + 1, np.minimum(counts, 1))
        sh_offsets = np.zeros(len(texts) + 1, np.int64)
        np.cumsum(m, out=sh_offsets[1:])
        total = int(sh_offsets[-1])
        flat_sh = np.empty(total, np.uint64)

        with np.errstate(over="ignore"):
            # one global rolling pass; windows that cross doc boundaries are
            # simply never gathered
            if n_tok >= k:
                nw = n_tok - k + 1
                acc = tok_h[:nw].copy()
                for j in range(1, k):
                    acc *= _POLY
                    acc += tok_h[j : j + nw]
            else:
                acc = np.empty(0, np.uint64)

            long_mask = counts >= k
            m_long = m[long_mask]
            if m_long.size:
                # gather index: for each long doc, arange(off, off + m_doc)
                starts = offsets[:-1][long_mask]
                rep_starts = np.repeat(starts, m_long)
                grp = np.repeat(np.cumsum(m_long) - m_long, m_long)
                intra = np.arange(rep_starts.size, dtype=np.int64) - grp
                src_idx = rep_starts + intra
                dst_starts = sh_offsets[:-1][long_mask]
                rep_dst = np.repeat(dst_starts, m_long)
                dst_idx = rep_dst + intra
                flat_sh[dst_idx] = splitmix64(acc[src_idx])

            # short docs (0 < n < k): one shingle mixing all their tokens —
            # rare in web corpora, loop only over those
            short_idx = np.nonzero((counts > 0) & ~long_mask)[0]
            for i in short_idx:
                seg = tok_h[offsets[i] : offsets[i + 1]]
                h = seg[0]
                for j in range(1, len(seg)):
                    h = h * _POLY + seg[j]
                flat_sh[sh_offsets[i]] = splitmix64(
                    np.array([h], np.uint64)
                )[0]

        return flat_sh, sh_offsets

    def signatures(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(sig matrix uint32 of shape (num_docs_with_content, num_perm),
        n_shingles int64 per input doc — 0 marks 'no signature row')."""
        flat_sh, offsets = self._shingle_hashes(texts)
        n_sh = np.diff(offsets)
        keep = n_sh > 0
        if not keep.any():
            return np.empty((0, self.cfg.num_perm), np.uint32), n_sh
        if self.cfg.method == "oph":
            return self._signatures_oph(flat_sh, n_sh, keep), n_sh
        starts = offsets[:-1][keep]
        # fold 64-bit shingle hashes to 32-bit x (top xor bottom)
        x = ((flat_sh >> np.uint64(32)) ^ (flat_sh & np.uint64(0xFFFFFFFF))).astype(
            np.uint64
        )
        P = self.cfg.num_perm
        out = np.empty((int(keep.sum()), P), np.uint32)
        chunk = 16  # perms per pass: bounds peak memory at chunk*len(x)*8B
        with np.errstate(over="ignore"):
            for c0 in range(0, P, chunk):
                c1 = min(c0 + chunk, P)
                vals = self.a[c0:c1, None] * x[None, :] + self.b[c0:c1, None]
                # Mersenne reduction mod 2^31-1 via shift-add (~3x faster
                # than the generic uint64 %): after two folds v < 2^31+1,
                # one conditional subtract canonicalizes to [0, p)
                vals = (vals & _P31) + (vals >> np.uint64(31))
                vals = (vals & _P31) + (vals >> np.uint64(31))
                vals -= np.where(vals >= _P31, _P31, np.uint64(0))
                mins = np.minimum.reduceat(vals, starts, axis=1)
                out[:, c0:c1] = mins.T.astype(np.uint32)
        return out, n_sh

    def _signatures_oph(
        self, flat_sh: np.ndarray, n_sh: np.ndarray, keep: np.ndarray
    ) -> np.ndarray:
        """One-permutation MinHash: each shingle hash lands in ONE bin
        (top log2(P) bits), bin value = min of low-32-bit values; empty bins
        are filled by circular borrow-from-left with a distance-mixed offset
        (rotation densification) so sparse docs stay comparable."""
        P = self.cfg.num_perm
        logp = P.bit_length() - 1
        D = int(keep.sum())
        doc_ord = np.repeat(np.arange(D, dtype=np.int64), n_sh[keep])
        bins = (flat_sh >> np.uint64(64 - logp)).astype(np.int64)
        vals = (flat_sh & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        SENT = np.uint64(1) << np.uint64(33)
        sig = np.full(D * P, SENT, np.uint64)
        np.minimum.at(sig, doc_ord * P + bins, vals)
        sig = sig.reshape(D, P)

        empty = sig >= SENT
        if empty.any():
            with np.errstate(over="ignore"):
                # circular forward-fill: for each bin, nearest filled bin at or
                # to its left in the doubled array ⇒ circular borrow
                tiled = np.concatenate([sig, sig], axis=1)
                col = np.arange(2 * P, dtype=np.int64)
                pos = np.where(tiled < SENT, col[None, :], np.int64(-1))
                np.maximum.accumulate(pos, axis=1, out=pos)
                pos2 = pos[:, P:]  # for bin j: last filled position ≤ j+P
                dist = (np.arange(P, dtype=np.int64)[None, :] + P) - pos2
                src = np.take_along_axis(tiled, pos2, axis=1)
                borrowed = (
                    src + dist.astype(np.uint64) * np.uint64(0x9E3779B9)
                ) & np.uint64(0xFFFFFFFF)
                sig = np.where(empty, borrowed, sig)
        return sig.astype(np.uint32)

    # ------------------------------------------------------------- stage fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sig, n_sh = self.signatures(texts)
        keep = n_sh > 0
        kept_ids = [i for i, k in zip(ids, keep) if k]
        nodes = node_ids([str(i) for i in kept_ids])
        # sig stored as binary (num_perm little-endian uint32s, or uint16
        # folds under cfg.sig_store="u2"): Arrow hash joins support binary
        # payloads but NOT (fixed_size_)list ones, and binary survives
        # pandas/parquet round-trips without object dtype
        sig_le = pack_sig(sig, self.cfg.sig_store)
        sig_bytes = pa.array(
            [sig_le[i].tobytes() for i in range(sig_le.shape[0])], pa.binary()
        )
        return pa.table(
            {
                self.id_col: pa.array(kept_ids),
                "node": pa.array(nodes),
                "sig": sig_bytes,
                "n_shingles": pa.array(n_sh[keep].astype(np.int64)),
            }
        )


def pack_sig(sig: np.ndarray, sig_store: str) -> np.ndarray:
    """uint32 signature matrix → contiguous little-endian storage matrix
    per MinHashConfig.sig_store ("u4" full / "u2" low-half folds)."""
    if sig_store == "u2":
        return np.ascontiguousarray((sig & np.uint32(0xFFFF)).astype("<u2"))
    return np.ascontiguousarray(sig.astype("<u4"))


def sig_matrix(col, num_perm: int) -> np.ndarray:
    """Stored sig binary column → value matrix, width-detected: num_perm
    uint32s ("u4" store) or num_perm uint16s ("u2"). Zero-copy view of
    the Arrow buffer either way."""
    from dupers_ray.functions.arrowview import binary_matrix

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), np.uint16)
    import pyarrow.compute as pc

    widths = pc.unique(pc.binary_length(col)).drop_null().to_pylist()
    if not widths:
        return np.empty((0, num_perm), np.uint16)
    if len(widths) > 1:
        raise ValueError(
            f"mixed signature widths {sorted(widths)} B in one table — a "
            f"persisted store and a delta scan must use the same "
            f"MinHashConfig.sig_store"
        )
    width = widths[0]
    if width == num_perm * 2:
        return binary_matrix(col, "<u2")
    if width == num_perm * 4:
        return binary_matrix(col, "<u4")
    raise ValueError(
        f"sig width {width} B matches neither u4 nor u2 at num_perm={num_perm}"
    )


def fold16_matrix(col, num_perm: int) -> np.ndarray:
    """Stored sig binary → uint16 fold matrix (the verify comparison
    domain): the identity for a "u2" store, the low halves for "u4"."""
    m = sig_matrix(col, num_perm)
    if m.dtype == np.uint16:
        return m
    return (m & np.uint32(0xFFFF)).astype(np.uint16)


def explode_bands(
    batch: pa.Table, *, bands: int, rows: int, id_col: str = "url"
) -> pa.Table:
    """Stateless map_batches stage: signature rows → (band_id, band_hash,
    id, node) rows, ``bands`` per doc. band_hash mixes the band's ``rows``
    signature values plus band_id (so identical sub-signatures in different
    bands never collide into one bucket). Rows with null sig (token-less
    docs in the fused digest+sig table) are skipped."""
    import pyarrow.compute as pc

    if batch.column("sig").null_count:
        batch = batch.filter(pc.is_valid(batch.column("sig")))
    sig = batch.column("sig")
    d = len(batch)
    if d == 0:
        return pa.table(
            {
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.uint64()),
                id_col: pa.array([], batch.schema.field(id_col).type),
                "node": pa.array([], pa.uint64()),
            }
        )
    mat = sig_matrix(sig, bands * rows).reshape(d, bands, rows).astype(np.uint64)
    hashes = np.empty((d, bands), np.uint64)
    for b in range(bands):
        with np.errstate(over="ignore"):
            acc = mix_rows_u64(mat[:, b, :] + np.uint64(b + 1))
        hashes[:, b] = acc
    ids = batch.column(id_col)
    nodes = batch.column("node")
    idx = pa.array(np.repeat(np.arange(d), bands))
    return pa.table(
        {
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), d)),
            "band_hash": pa.array(hashes.reshape(-1)),
            id_col: ids.take(idx),
            "node": nodes.take(idx),
        }
    )


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate: fraction of equal signature components."""
    return float(np.mean(sig_a == sig_b))


def plan_lsh(
    threshold: float,
    num_perm: int = 128,
    *,
    fn_weight: float = 1.0,
    fp_weight: float = 1.0,
) -> tuple[int, int]:
    """Choose LSH banding (bands, rows) for a target Jaccard ``threshold``
    and a permutation budget: minimize the weighted error mass of the
    S-curve P(s) = 1 - (1 - s^r)^b against the ideal step at the
    threshold — ∫₀ᵗ fp·P(s) ds + ∫ₜ¹ fn·(1 - P(s)) ds — over every exact
    factorization b·r = num_perm (the standard MMDS ch.3 tuning,
    Leskovec/Rajaraman/Ullman; public literature). Deterministic
    midpoint quadrature, no RNG. Use ``fn_weight > fp_weight`` when
    missed dup pairs cost more than verify work (the north rule's
    recall ≥ 0.99 regime).

    Returns (bands, rows) ready for :class:`dupers_ray.config`'s
    MinHash config (bands * rows == num_perm always holds)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    if num_perm < 1:
        raise ValueError("num_perm must be positive")
    s = (np.arange(1000, dtype=np.float64) + 0.5) / 1000.0
    below = s < threshold
    best: tuple[float, int, int] | None = None
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        p = 1.0 - (1.0 - s**r) ** b
        err = (
            fp_weight * p[below].sum() + fn_weight * (1.0 - p[~below]).sum()
        ) / 1000.0
        # tie-break toward fewer bands (fewer shuffled band rows/doc)
        if best is None or err < best[0] - 1e-12:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
