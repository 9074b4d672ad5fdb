"""Deterministic char-n-gram feature-hash embeddings.

Stand-in for the reference's learned entity/mention embeddings
(BASELINE.json:6 "embedding nearest-neighbor scoring"): each string is
embedded as a unit vector by hashing its char trigrams into a fixed
number of signed buckets. Cross-run stable (blake2b-based), cheap, and
exact-match-faithful (identical normalized strings → identical vectors,
cosine 1.0), which is what the linker's accept-threshold semantics need.
dim=64 matches the driver's embeddings.parquet fixtures (FIXTURES.md F3).
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_u64

DIM = 64


def embed_string(s: str, dim: int = DIM) -> np.ndarray:
    """Unit-norm char-trigram feature-hash vector of a (normalized)
    string; the EMPTY string embeds to ZEROS (cosine 0 against
    everything), so surfaces that normalize away entirely can never
    kNN-link to anything — they fall through to their canonical
    fallback id. (Previously '' embedded its '^^$'/'^$$' padding
    trigrams into a live unit vector shared by every empty surface.)"""
    v = np.zeros(dim, dtype=np.float32)
    if not s:
        return v
    padded = f"^^{s}$$"
    for i in range(len(padded) - 2):
        u = stable_u64(padded[i : i + 3])
        v[u % dim] += 1.0 if (u >> 7) & 1 else -1.0
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def embed_strings(strings: list[str], dim: int = DIM) -> np.ndarray:
    """[n, dim] matrix of unit vectors (rows of zeros for empty strings)."""
    if not strings:
        return np.zeros((0, dim), dtype=np.float32)
    return np.stack([embed_string(s, dim) for s in strings])
