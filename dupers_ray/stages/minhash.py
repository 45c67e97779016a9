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
        int64 of length len(texts)+1). Docs with 0 tokens get empty segments."""
        k = self.shingle.k
        toks_per_doc: list[list[str]] = []
        for t in texts:
            s = t if t is not None else ""
            if self.shingle.lowercase:
                s = s.lower()
            toks_per_doc.append(self.tok.findall(s))

        flat = [w for toks in toks_per_doc for w in toks]
        if not flat:
            return np.empty(0, np.uint64), np.zeros(len(texts) + 1, np.int64)

        arr = np.array(flat, dtype=object)
        uniq, inv = np.unique(arr, return_inverse=True)
        tok_h = hash_str_u64(list(uniq))[inv]  # uint64 per token position

        sh_chunks: list[np.ndarray] = []
        offsets = np.zeros(len(texts) + 1, np.int64)
        pos = 0
        with np.errstate(over="ignore"):
            for i, toks in enumerate(toks_per_doc):
                n = len(toks)
                seg = tok_h[pos : pos + n]
                pos += n
                if n == 0:
                    offsets[i + 1] = offsets[i]
                    continue
                kk = min(k, n)  # short docs: one shingle over all tokens
                m = n - kk + 1
                h = seg[:m].copy()
                for j in range(1, kk):
                    h = h * _POLY + seg[j : j + m]
                sh = splitmix64(h)
                sh_chunks.append(sh)
                offsets[i + 1] = offsets[i] + m
        flat_sh = (
            np.concatenate(sh_chunks) if sh_chunks else np.empty(0, np.uint64)
        )
        return flat_sh, offsets

    def signatures(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(sig matrix uint32 of shape (num_docs_with_content, num_perm),
        n_shingles int64 per input doc — 0 marks 'no signature row')."""
        flat_sh, offsets = self._shingle_hashes(texts)
        n_sh = np.diff(offsets)
        keep = n_sh > 0
        if not keep.any():
            return np.empty((0, self.cfg.num_perm), np.uint32), n_sh
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
                vals = (self.a[c0:c1, None] * x[None, :] + self.b[c0:c1, None]) % _P31
                mins = np.minimum.reduceat(vals, starts, axis=1)
                out[:, c0:c1] = mins.T.astype(np.uint32)
        return out, n_sh

    # ------------------------------------------------------------- stage fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sig, n_sh = self.signatures(texts)
        keep = n_sh > 0
        kept_ids = [i for i, k in zip(ids, keep) if k]
        nodes = node_ids([str(i) for i in kept_ids])
        # sig stored as binary (num_perm little-endian uint32s): Arrow hash
        # joins support binary payloads but NOT (fixed_size_)list ones, and
        # binary survives pandas/parquet round-trips without object dtype
        sig_le = np.ascontiguousarray(sig.astype("<u4"))
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


def explode_bands(
    batch: pa.Table, *, bands: int, rows: int, id_col: str = "url"
) -> pa.Table:
    """Stateless map_batches stage: signature rows → (band_id, band_hash,
    id, node) rows, ``bands`` per doc. band_hash mixes the band's ``rows``
    signature values plus band_id (so identical sub-signatures in different
    bands never collide into one bucket)."""
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
    bufs = sig.to_pylist()
    flat = np.frombuffer(b"".join(bufs), dtype="<u4")
    mat = flat.reshape(d, bands, rows).astype(np.uint64)
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
