"""Stable hashing utilities.

Two tiers, chosen deliberately (SURVEY.md §4.3 determinism rules):

- **Cross-run-stable** hashes (``stable_u64``, ``stable_hex``,
  ``span_fingerprints``): blake2b-based, identical across processes,
  Python versions and library versions. Used for everything persisted or
  compared across runs — entity ids, partition assignment, lineage
  fingerprints, golden fixtures. Python-loop cost is paid only on
  id-sized strings (cheap) or once per row (span fingerprint), never per
  token.
- **Within-run vectorized** hashes (``polars_u64``): polars' ahash with a
  fixed seed — deterministic within a pinned environment, NOT guaranteed
  across polars versions. Used only where cross-run stability is not
  required (salt assignment, minhash base hashes, dedup bucketing whose
  outputs are compared semantically, not by hash value).

Never use Python's builtin ``hash`` (per-process randomized).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pyarrow as pa

_MERSENNE_61 = (1 << 61) - 1


def stable_u64(value: str | bytes) -> int:
    """Cross-run-stable 64-bit hash of a string/bytes."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(value, digest_size=8).digest(), "little")


def stable_hex(value: str | bytes, length: int = 16) -> str:
    """Cross-run-stable hex digest prefix (entity ids, fingerprints)."""
    if isinstance(value, str):
        value = value.encode("utf-8", "surrogatepass")
    return hashlib.blake2b(value, digest_size=(length + 1) // 2).hexdigest()[:length]


def stable_u64_array(values: Iterable[str]) -> np.ndarray:
    """Cross-run-stable u64 per string. Loop is C-level hashlib; fine for
    id-sized strings (≈1M/s). Hot row-scale hashing that only needs
    within-run stability should use :func:`polars_u64` instead."""
    b2 = hashlib.blake2b
    return np.fromiter(
        (int.from_bytes(b2(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "little") for v in values),
        dtype=np.uint64,
    )


def md5_u64_array(values: Iterable[str]) -> np.ndarray:
    """u64 per string as the LITTLE-ENDIAN read of bytes 8..16 of the
    md5 digest — numerically identical to DuckDB 1.0's
    ``md5_number_lower()`` (verified value-equal in the sandbox), the
    one 64-bit string hash both engines expose. Exists so operators
    whose only oracle blocker is a label/landmark hash can offer an
    oracle-replicable mode (the kg_harmonic md5-landmark precedent;
    used by label_propagation's ``label_key="md5"``). Same C-level
    hashlib loop cost class as :func:`stable_u64_array`."""
    m = hashlib.md5
    return np.fromiter(
        (int.from_bytes(m(v.encode("utf-8", "surrogatepass")).digest()[8:], "little") for v in values),
        dtype=np.uint64,
    )


def mix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over int64/uint64 arrays —
    cross-run-stable (pure arithmetic, no library hash), uniform enough
    for hash-based sampling and sharding of integer keys."""
    z = (np.asarray(x).astype(np.uint64) + np.uint64(seed)) + np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def polars_u64(arr: "pa.Array | pa.ChunkedArray", seed: int = 42) -> np.ndarray:
    """Vectorized u64 hash of an Arrow string/binary array via polars.

    Within-run deterministic (fixed seed); not guaranteed stable across
    polars versions — do not persist these values across runs.
    """
    import polars as pl

    s = pl.from_arrow(arr if isinstance(arr, (pa.Array, pa.ChunkedArray)) else pa.array(arr))
    return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)


def minhash_permute(base: np.ndarray, num_perm: int, seed: int = 42) -> np.ndarray:
    """k universal-hash permutations of u64 base hashes.

    ``h_i(x) = (a_i * x + b_i) mod M61`` with seeded odd multipliers —
    the standard minhash permutation family, vectorized: input ``[n]``
    base hashes → ``[num_perm, n]`` permuted values.
    """
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, _MERSENNE_61, size=num_perm, dtype=np.uint64) | np.uint64(1)) % np.uint64(_MERSENNE_61)
    b = rng.integers(0, _MERSENNE_61, size=num_perm, dtype=np.uint64)
    x = (base % np.uint64(_MERSENNE_61)).astype(np.uint64)
    # Use object->uint128 avoidance: compute in python-int-free numpy via
    # splitting is overkill at these sizes; float64 would lose precision.
    # Do modmul in uint64 with overflow-safe 32-bit split.
    return _modmul_add(a[:, None], x[None, :], b[:, None])


def _modmul_add(a: np.ndarray, x: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod 2^61-1, EXACT, using uint64 intermediates only.

    Both operands split into 32-bit halves. The cross terms need a
    multiply by 2^32, done by SHIFT-folding — for t < 2^61:
    t·2^32 ≡ (t >> 29) + ((t & (2^29−1)) << 32)  (mod M61), both addends
    < 2^61 — so no intermediate ever exceeds 2^63. (A previous version
    computed ((a_lo·x_hi) % M)·2^32 directly, which wraps at 2^64 and
    silently broke the universal-hash family.)
    """
    M = np.uint64(_MERSENNE_61)
    MASK29 = np.uint64((1 << 29) - 1)
    U32 = np.uint64(0xFFFFFFFF)

    def fold(v: np.ndarray) -> np.ndarray:
        # v < 2^64 → congruent value < M (two steps: fold then clamp).
        v = (v >> np.uint64(61)) + (v & M)
        return np.where(v >= M, v - M, v)

    a = a % M
    x = x % M
    a_lo, a_hi = a & U32, a >> np.uint64(32)  # a_hi < 2^29
    x_lo, x_hi = x & U32, x >> np.uint64(32)  # x_hi < 2^29
    t_lo = fold(a_lo * x_lo)                       # product < 2^64
    t_hi = fold((a_hi * x_hi) << np.uint64(3))     # < 2^58, ·8 = ·2^64 mod M
    mid = fold(a_hi * x_lo + a_lo * x_hi)          # < 2^62 before fold
    mid = fold((mid >> np.uint64(29)) + ((mid & MASK29) << np.uint64(32)))  # ·2^32
    return fold(t_lo + t_hi + mid + b % M)         # sum < 4·M < 2^63


def sha256_of_sorted(items: Iterable[str]) -> str:
    """Order-insensitive content fingerprint (lineage manifests, A21).

    Each item is LENGTH-PREFIXED before hashing: a separator-only scheme
    is not injective (['a\\x00b'] would collide with ['a','b']), and an
    ambiguous lineage fingerprint could mark stale work as done."""
    h = hashlib.sha256()
    for it in sorted(items):
        b = it.encode("utf-8", "surrogatepass")
        h.update(len(b).to_bytes(4, "little"))
        h.update(b)
    return h.hexdigest()
