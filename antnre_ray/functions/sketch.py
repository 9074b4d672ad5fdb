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


def kmv_theta(sketch: np.ndarray, k: int = K_DEFAULT) -> float:
    """Effective theta of a KMV sketch: the fraction of hash space the
    retained set covers. Below k distinct values the sketch is EXACT
    (every hash retained, theta = 1); at k the k-th minimum is the
    exclusive bound and the k-1 hashes below it are the retained set —
    the convention that makes kmv_estimate == len(retained)/theta."""
    if len(sketch) < k:
        return 1.0
    return float(sketch[k - 1]) / _U64_MAX


def kmv_set_estimates(
    sa: np.ndarray, sb: np.ndarray, k: int = K_DEFAULT
) -> dict[str, float]:
    """Theta-sketch set-operation estimates over two KMV sketches
    (Dasgupta et al., "Theta-Sketch Framework", 2016): clip both
    retained sets to the SHARED theta = min(theta_a, theta_b) — below
    it each sketch holds EVERY hash of its stream, so intersection /
    union / difference of the clipped sets are uniform samples of the
    true sets at rate theta, and count/theta estimates each
    cardinality. Exact when both streams stayed under k distinct.
    Relative error grows as the result's share of the union shrinks
    (a tiny intersection of two huge sets is sampled by few hashes) —
    the framework's documented trade, not a bug."""
    bounds = [s[k - 1] for s in (sa, sb) if len(s) >= k]  # exact u64 kth mins
    bound = min(bounds) if bounds else None
    theta = float(bound) / _U64_MAX if bound is not None else 1.0
    A = sa[sa < bound] if bound is not None else sa
    B = sb[sb < bound] if bound is not None else sb
    inter = float(len(np.intersect1d(A, B, assume_unique=True)))
    union = float(len(A) + len(B)) - inter
    return {
        "union": union / theta,
        "intersection": inter / theta,
        "a_not_b": (float(len(A)) - inter) / theta,
        "theta": theta,
    }


# --------------------------------------------------------- HyperLogLog

HLL_P = 12  # 2^12 registers → standard error ≈ 1.04/sqrt(4096) ≈ 1.6%
_HLL_M = 1 << HLL_P


def hll_partial(values: pa.Array | pa.ChunkedArray, seed: int = 42) -> np.ndarray:
    """One batch's HLL register vector (uint8[2^p]).

    Vectorized rho: the leading-zero count of the post-index bits comes
    from a 6-step binary search over bit shifts — no per-value Python.
    Registers merge by ELEMENTWISE MAX (order-free, idempotent), the
    property that makes HLL the canonical distributed cardinality
    sketch next to KMV's k-smallest-union."""
    h = polars_u64(values, seed=seed)
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rem = (h << np.uint64(HLL_P)) | np.uint64(1 << (HLL_P - 1))  # never zero
    # clz(rem) via binary search on the high bits.
    lz = np.zeros(len(rem), dtype=np.uint8)
    cur = rem.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << np.uint64(shift)
    rho = lz.astype(np.uint8) + 1  # position of first 1-bit in the suffix
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    if not partials:
        return np.zeros(_HLL_M, dtype=np.uint8)
    out = partials[0].copy()
    for p in partials[1:]:
        np.maximum(out, p, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. bias-corrected estimate with the small-range
    (linear counting) and large-range corrections."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    two64 = float(2**64)
    if est > two64 / 30.0:
        return -two64 * float(np.log1p(-est / two64))
    return est


# ------------------- mergeable quantile sketch (compressed weighted CDF)

Q_POINTS = 256


def quantile_partial(values: np.ndarray, m: int = Q_POINTS) -> np.ndarray:
    """Compress a value array to m weighted CDF points: sorted order
    statistics at evenly-spaced ranks, each carrying weight n/m (the
    last point absorbs the remainder). Returns a (m', 2) float64 array
    of (value, weight) rows, m' ≤ m. Rank error after one compression
    ≤ n/m; after a two-level merge tree it stays ≤ depth/m of total
    rank (≈0.8 % at m=256, depth 2)."""
    n = len(values)
    if n == 0:
        return np.zeros((0, 2), dtype=np.float64)
    v = np.sort(values.astype(np.float64))
    if n <= m:
        return np.stack([v, np.ones(n)], axis=1)
    idx = ((np.arange(m) + 0.5) * n / m).astype(np.int64)
    w = np.full(m, n / m, dtype=np.float64)
    return np.stack([v[idx], w], axis=1)


def quantile_merge(partials: list[np.ndarray], m: int = Q_POINTS) -> np.ndarray:
    """Merge weighted CDF partials and recompress to m points, keeping
    total weight exact (the recompressed weights sum to the input's)."""
    pts = [p for p in partials if len(p)]
    if not pts:
        return np.zeros((0, 2), dtype=np.float64)
    allp = np.concatenate(pts)
    order = np.argsort(allp[:, 0], kind="stable")
    v, w = allp[order, 0], allp[order, 1]
    total = w.sum()
    if len(v) <= m:
        return np.stack([v, w], axis=1)
    cum = np.cumsum(w) - w / 2  # midpoint ranks
    targets = (np.arange(m) + 0.5) * total / m
    idx = np.searchsorted(cum, targets)
    idx = np.clip(idx, 0, len(v) - 1)
    return np.stack([v[idx], np.full(m, total / m)], axis=1)


def quantile_query(sketch: np.ndarray, q: float) -> float:
    """Value at quantile q ∈ [0, 1] from a merged (value, weight) sketch."""
    if len(sketch) == 0:
        return float("nan")
    v, w = sketch[:, 0], sketch[:, 1]
    cum = np.cumsum(w) - w / 2
    target = q * w.sum()
    return float(np.interp(target, cum, v))


def quantile_rank(sketch: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Approximate CDF rank in [0, 1] for each value — the inverse of
    :func:`quantile_query`, vectorized (one np.interp over the merged
    (value, weight) sketch). Midpoint-rank convention matches
    quantile_query, so rank(query(q)) ≈ q."""
    if len(sketch) == 0:
        return np.full(len(values), np.nan)
    v, w = sketch[:, 0], sketch[:, 1]
    cum = np.cumsum(w) - w / 2
    return np.interp(np.asarray(values, dtype=np.float64), v, cum / w.sum())


# ------------------- Bloom filter (join prefilter / membership)

def bloom_build(
    keys: np.ndarray, n_bits: int = 1 << 20, n_hashes: int = 5, seed: int = 42
) -> np.ndarray:
    """Bit array (packed uint64) with each key set by n_hashes probes.
    Double hashing h1 + i*h2 over the key's u64 hash — the standard
    Kirsch-Mitzenmacher construction, fully vectorized. At the default
    1 Mbit / 5 hashes, false-positive rate ≈ 0.6 % at 100k keys."""
    h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(seed)
    h1 = h >> np.uint64(32)
    h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
    bits = np.zeros(n_bits // 64, dtype=np.uint64)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    return bits


def bloom_contains(
    bits: np.ndarray, keys: np.ndarray, n_hashes: int = 5, seed: int = 42
) -> np.ndarray:
    """Vectorized membership probe; no false negatives."""
    n_bits = len(bits) * 64
    h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(seed)
    h1 = h >> np.uint64(32)
    h2 = (h & np.uint64(0xFFFFFFFF)) | np.uint64(1)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


# ------------------- Misra-Gries heavy hitters (mergeable frequent items)

MG_K = 64


def mg_compress(items: np.ndarray, counts: np.ndarray, k: int = MG_K):
    """Misra-Gries compression: keep at most k counters by subtracting
    the (k+1)-th largest count from every counter and dropping the
    non-positive ones. Any item's stored count underestimates its true
    count by at most the total weight decremented, which across a whole
    stream/merge tree is bounded by n/(k+1) (Agarwal et al. 2012,
    "Mergeable summaries" — MG summaries merge by counter addition
    followed by this same compression, preserving the bound)."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(counts)[::-1]
    thresh = counts[order[k]]
    kept = counts - thresh
    mask = kept > 0
    return items[mask], kept[mask]


def mg_merge(partials: list[tuple[np.ndarray, np.ndarray]], k: int = MG_K):
    """Merge MG partials: sum counters per item, then re-compress."""
    items = np.concatenate([p[0] for p in partials])
    counts = np.concatenate([p[1] for p in partials])
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.bincount(inv, weights=counts).astype(np.int64)
    return mg_compress(uniq, summed, k)


# ------------------------------------------------- Count-Min (point frequency)

CM_D = 4        # rows (independent hash functions)
CM_W = 1 << 14  # columns per row → ε = e/W ≈ 1.7e-4 of total count


def cm_partial(values: pa.Array | pa.ChunkedArray, seed: int = 42) -> np.ndarray:
    """Per-batch Count-Min partial: a (CM_D, CM_W) uint64 counter grid.
    Each value increments one counter per row, rows indexed by the
    Kirsch-Mitzenmacher double-hash family (h1 + i*h2, the same
    construction the Bloom filter uses). Mergeable by elementwise
    addition — counts are exact sums, only the point QUERY overcounts
    (collisions only ever add), giving the classic one-sided bound
    true <= est <= true + (e/W)·N with prob 1 - e^-D."""
    h1 = polars_u64(values if isinstance(values, pa.Array) else values.combine_chunks(), seed=seed)
    h2 = polars_u64(values if isinstance(values, pa.Array) else values.combine_chunks(), seed=seed + 1) | np.uint64(1)
    grid = np.zeros((CM_D, CM_W), dtype=np.uint64)
    for d in range(CM_D):
        idx = ((h1 + np.uint64(d) * h2) % np.uint64(CM_W)).astype(np.int64)
        np.add.at(grid[d], idx, 1)
    return grid


def cm_merge(partials: list[np.ndarray]) -> np.ndarray:
    """Counter addition — associative, commutative, order-independent."""
    out = np.zeros((CM_D, CM_W), dtype=np.uint64)
    for p in partials:
        out += p
    return out


def cm_query(grid: np.ndarray, values: pa.Array | pa.ChunkedArray, seed: int = 42) -> np.ndarray:
    """Vectorized point-frequency estimates: min over the D counters."""
    v = values if isinstance(values, pa.Array) else values.combine_chunks()
    h1 = polars_u64(v, seed=seed)
    h2 = polars_u64(v, seed=seed + 1) | np.uint64(1)
    est = np.full(len(v), np.iinfo(np.uint64).max, dtype=np.uint64)
    for d in range(CM_D):
        idx = ((h1 + np.uint64(d) * h2) % np.uint64(CM_W)).astype(np.int64)
        est = np.minimum(est, grid[d][idx])
    return est.astype(np.int64)
