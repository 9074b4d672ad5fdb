"""Distributed-mergeable sketches (SURVEY.md B18).

KMV (k-minimum-values) distinct-count estimator: keep the k smallest
u64 hashes per batch; union-merge partials by keeping the k smallest of
the union; estimate |D| ≈ (k-1) * 2^64 / kth_min. Standard error
≈ 1/sqrt(k-2) (~3.1% at k=1024). Per-batch partials are tiny (k u64s),
so the "shuffle" is a driver-side merge of a few KB per block — the
canonical sketch shape for 100 TB aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import polars_u64

K_DEFAULT = 1024
_U64_MAX = float(2**64)


def kmv_partial(values: pa.Array | pa.ChunkedArray, k: int = K_DEFAULT, seed: int = 42) -> np.ndarray:
    """k smallest distinct hashes of a column chunk (sorted ascending)."""
    h = np.unique(polars_u64(values, seed=seed))
    return h[:k]


def kmv_merge(partials: list[np.ndarray], k: int = K_DEFAULT) -> np.ndarray:
    if not partials:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(partials))[:k]


def kmv_estimate(sketch: np.ndarray, k: int = K_DEFAULT) -> float:
    n = len(sketch)
    if n < k:  # saw fewer than k distinct values → exact
        return float(n)
    kth = float(sketch[k - 1])
    return (k - 1) * _U64_MAX / kth
