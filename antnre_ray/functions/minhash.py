"""MinHash / SimHash / shingle kernels for near-duplicate detection.

All vectorized over whole batches: one polars hash pass over the
flattened shingles, then numpy segment-mins for MinHash signatures and
sign-accumulations for SimHash. Within-run deterministic (fixed seeds);
dedup outputs are compared semantically (which pairs), never by raw hash
value, so polars-version stability is not required (functions/hashing.py
tier rules).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import minhash_permute, polars_u64

NUM_PERM = 64
BANDS = 16  # 16 bands x 4 rows: catches Jaccard ≳ 0.6 with high prob
ROWS_PER_BAND = NUM_PERM // BANDS


def shingle_batch(texts: list[str], k: int = 3) -> tuple[list[str], np.ndarray]:
    """Word k-gram shingles of each text → (flat shingles, doc boundaries).

    Returns the flattened shingle strings and an int64 offsets array of
    length len(texts)+1 (doc i owns flat[offsets[i]:offsets[i+1]]).
    """
    flat: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, text in enumerate(texts):
        words = (text or "").lower().split()
        if len(words) >= k:
            flat.extend(" ".join(words[j : j + k]) for j in range(len(words) - k + 1))
        elif words:
            flat.append(" ".join(words))
        offsets[i + 1] = len(flat)
    return flat, offsets


def minhash_signatures(texts: list[str], k: int = 3, num_perm: int = NUM_PERM, seed: int = 42) -> np.ndarray:
    """[n_docs, num_perm] uint64 MinHash signatures (empty docs → max)."""
    flat, offsets = shingle_batch(texts, k)
    n = len(texts)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not flat:
        return sigs
    base = polars_u64(pa.array(flat), seed=seed)
    perms = minhash_permute(base, num_perm, seed=seed)  # [num_perm, n_shingles]
    counts = np.diff(offsets)
    nonempty = np.nonzero(counts > 0)[0]
    if len(nonempty) == 0:
        return sigs
    # Segment-min per doc: reduceat at each nonempty doc's start offset.
    starts = offsets[nonempty]
    mins = np.minimum.reduceat(perms, starts, axis=1)  # [num_perm, n_nonempty]
    sigs[nonempty] = mins.T
    return sigs


def band_keys(sigs: np.ndarray, bands: int = BANDS) -> np.ndarray:
    """[n_docs, bands] uint64 LSH bucket keys (rows of a band mixed)."""
    n, num_perm = sigs.shape
    rpb = num_perm // bands
    out = np.zeros((n, bands), dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    for b in range(bands):
        acc = np.zeros(n, dtype=np.uint64)
        for r in range(rpb):
            acc = (acc ^ sigs[:, b * rpb + r]) * mix
        out[:, b] = acc
    return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    fa, _ = shingle_batch([text_a], k)
    fb, _ = shingle_batch([text_b], k)
    sa, sb = set(fa), set(fb)
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def simhash_signatures(texts: list[str], seed: int = 42) -> np.ndarray:
    """[n_docs] uint64 SimHash over word features (weight = term count)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    flat: list[str] = []
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, text in enumerate(texts):
        flat.extend((text or "").lower().split())
        offsets[i + 1] = len(flat)
    if not flat:
        return out
    h = polars_u64(pa.array(flat), seed=seed)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
    signed = bits * 2 - 1  # [n_words, 64] in {-1, +1}
    # Mirror minhash_signatures: reduceat ONLY at the starts of nonempty
    # docs (each segment then ends exactly at the next nonempty start /
    # the array end), leaving empty docs zero. Clipping ALL offsets
    # instead would silently chop the final word off a doc followed by an
    # empty one, making signatures batch-composition-dependent.
    counts = np.diff(offsets)
    nonempty = np.nonzero(counts > 0)[0]
    sums = np.zeros((n, 64), dtype=np.int64)
    if len(nonempty):
        sums[nonempty] = np.add.reduceat(signed, offsets[nonempty], axis=0)
    fingerbits = (sums > 0).astype(np.uint64)
    return (fingerbits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_band_keys(sigs: np.ndarray, chunks: int = 4) -> np.ndarray:
    """[n, chunks] uint16 keys: a pair within hamming distance < chunks
    shares at least one exact 16-bit chunk (pigeonhole)."""
    n = len(sigs)
    out = np.zeros((n, chunks), dtype=np.uint64)
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)
    for c in range(chunks):
        out[:, c] = (sigs >> np.uint64(c * width)) & mask
    return out
