"""Shared pair-list kernels used by the dedup/graph stages."""

from __future__ import annotations

import numpy as np


def unique_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort (a, b) rows lexicographically and drop adjacent duplicates —
    the single implementation behind cross-band candidate dedup
    (stages/bucket_index), edge-list dedup (pipelines/components) and LSH
    cosine-pair dedup (stages/embed). Output is sorted by (a, b); dtypes
    are preserved."""
    if not len(a):
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    return a[keep], b[keep]
