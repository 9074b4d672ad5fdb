"""Numpy inference kernels for the joint NER+RE model.

Implements, inference-only and fully batched, the model family of the
reference (BiLSTM-CRF span detector + biaffine relation classifier,
BASELINE.json:6; upstream antNRE/src/{word_encoder,seq_encoder}.py-ish
modules, UNVERIFIED — SURVEY.md §0): char-CNN token features, a
bidirectional LSTM sentence encoder, a linear-chain CRF with Viterbi
decoding, and biaffine pair scoring.

Design rules (SURVEY.md §7.4.1, §4.3):
- Vectorized over the batch ONLY through per-row matmuls and masking, so
  each sentence's result is independent of how it was batched — required
  for bit-stable output across partition counts and cpu levels.
- All argmax tie-breaks resolve to the LOWEST index (numpy argmax
  default), pinned for triple-equality.
- float32 throughout; no RNG at inference time.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_forward(
    X: np.ndarray,  # [B, T, D] float32, right-padded
    mask: np.ndarray,  # [B, T] float32 (1.0 where t < length)
    Wx: np.ndarray,  # [D, 4h]
    Wh: np.ndarray,  # [h, 4h]
    b: np.ndarray,  # [4h]
    reverse: bool = False,
) -> np.ndarray:
    """One-direction masked LSTM → hidden states [B, T, h].

    Gate layout i|f|o|g. Masked steps carry state through unchanged, so a
    sentence's states never depend on the padding (and the reverse pass
    correctly starts at each sentence's own last token).
    """
    B, T, D = X.shape
    h = Wh.shape[0]
    H = np.zeros((B, T, h), dtype=np.float32)
    ht = np.zeros((B, h), dtype=np.float32)
    ct = np.zeros((B, h), dtype=np.float32)
    # Input contribution for ALL steps in one gemm (the per-step loop then
    # only does the [B,h]@[h,4h] recurrent matmul). Row-wise results are
    # unchanged: each (b,t) row of Xp depends only on X[b,t].
    Xp = (X.reshape(B * T, D) @ Wx).reshape(B, T, 4 * h) + b
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        g = Xp[:, t, :] + ht @ Wh  # [B, 4h]
        ifo = sigmoid(g[:, : 3 * h])
        i = ifo[:, :h]
        f = ifo[:, h : 2 * h]
        o = ifo[:, 2 * h :]
        c_hat = np.tanh(g[:, 3 * h :])
        c_new = f * ct + i * c_hat
        h_new = o * np.tanh(c_new)
        m = mask[:, t : t + 1]
        ct = m * c_new + (1.0 - m) * ct
        ht = m * h_new + (1.0 - m) * ht
        H[:, t, :] = ht * m
    return H


def bilstm_forward(X, mask, params: dict) -> np.ndarray:
    """Bidirectional LSTM → [B, T, 2h] (forward ‖ backward states)."""
    fwd = lstm_forward(X, mask, params["Wx_f"], params["Wh_f"], params["b_f"], reverse=False)
    bwd = lstm_forward(X, mask, params["Wx_b"], params["Wh_b"], params["b_b"], reverse=True)
    return np.concatenate([fwd, bwd], axis=-1)


def char_cnn(
    char_ids: np.ndarray,  # [N, L] int32, 0-padded
    emb: np.ndarray,  # [C, dc]
    Wc: np.ndarray,  # [3*dc, c_out]
    bc: np.ndarray,  # [c_out]
) -> np.ndarray:
    """Width-3 char convolution + ReLU + max-over-time → [N, c_out].

    Vectorized over every token in the batch at once (N = total tokens).
    Requires ``emb[0] == 0`` (PAD row): windows adjacent to a token's end
    then see the same zeros whether the boundary is the explicit edge pad
    or in-matrix PAD cells, so a token's feature is independent of the
    char-matrix width it was batched into.
    """
    N, L = char_ids.shape
    E = emb[char_ids]  # [N, L, dc]
    dc = E.shape[-1]
    pad = np.zeros((N, 1, dc), dtype=np.float32)
    Ep = np.concatenate([pad, E, pad], axis=1)  # [N, L+2, dc]
    windows = np.concatenate([Ep[:, :-2], Ep[:, 1:-1], Ep[:, 2:]], axis=-1)  # [N, L, 3dc]
    Y = np.maximum(windows @ Wc + bc, 0.0)  # [N, L, c_out]
    # Mask padding chars out of the max (char id 0 = PAD).
    valid = (char_ids > 0)[:, :, None]
    Y = np.where(valid, Y, -np.inf)
    out = Y.max(axis=1)
    # All-pad (empty) tokens → zeros.
    return np.where(np.isfinite(out), out, 0.0).astype(np.float32)


def crf_viterbi(
    emissions: np.ndarray,  # [B, T, K] float32
    lengths: np.ndarray,  # [B] int32
    trans: np.ndarray,  # [K, K] from→to
    start: np.ndarray,  # [K]
    end: np.ndarray,  # [K]
) -> np.ndarray:
    """Batched Viterbi decode → tags [B, T] int32 (padding positions = 0).

    Ties break to the lowest tag index (np.argmax picks the first
    maximum) — pinned for determinism (SURVEY.md §4.3.3).
    """
    B, T, K = emissions.shape
    dp_hist = np.empty((B, T, K), dtype=np.float32)
    bp = np.zeros((B, T, K), dtype=np.int32)
    dp = start[None, :] + emissions[:, 0, :]
    dp_hist[:, 0] = dp
    for t in range(1, T):
        scores = dp[:, :, None] + trans[None, :, :]  # [B, from, to]
        best_prev = scores.argmax(axis=1)  # [B, K] lowest-index ties
        dp_new = np.take_along_axis(scores, best_prev[:, None, :], axis=1)[:, 0, :] + emissions[:, t, :]
        active = (lengths > t)[:, None]
        dp = np.where(active, dp_new, dp)
        bp[:, t, :] = best_prev
        dp_hist[:, t] = dp
    tags = np.zeros((B, T), dtype=np.int32)
    last = np.maximum(lengths - 1, 0)
    final = dp_hist[np.arange(B), last, :] + end[None, :]
    cur = final.argmax(axis=1).astype(np.int32)
    tags[np.arange(B), last] = cur
    # Vectorized backtrack: walk t from the right; only sentences whose
    # last position is ≥ t participate at step t.
    for t in range(T - 1, 0, -1):
        prev = bp[np.arange(B), t, cur]
        step_here = last >= t
        tags[:, t - 1] = np.where(step_here, prev, tags[:, t - 1])
        cur = np.where(step_here, prev, cur).astype(np.int32)
    return tags


def viterbi_bruteforce(emissions: np.ndarray, trans: np.ndarray, start: np.ndarray, end: np.ndarray) -> list[int]:
    """Exponential-time reference for tests: enumerate all tag paths of
    one sentence (emissions [T, K]) and return the argmax path.

    Tie-break matches :func:`crf_viterbi`'s actual behavior — the DP
    resolves ties from the END backwards (final tag = lowest-index
    argmax, then each backpointer the lowest 'from' index), i.e. among
    tied paths the one with the lexicographically-smallest REVERSED tag
    tuple wins. (The random-float test inputs never tie, but the
    reference must not flake if they ever do.)"""
    T, K = emissions.shape
    best_score, best_path = -np.inf, None
    from itertools import product

    for path in product(range(K), repeat=T):
        s = start[path[0]] + emissions[0, path[0]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + emissions[t, path[t]]
        s += end[path[-1]]
        if s > best_score or (s == best_score and path[::-1] < best_path[::-1]):
            best_score, best_path = s, path
    return list(best_path)


def biaffine_score(
    S: np.ndarray,  # [P, d] subject span representations
    O: np.ndarray,  # [P, d] object span representations
    U: np.ndarray,  # [R, d, d]
    W: np.ndarray,  # [R, 2d]
    b: np.ndarray,  # [R]
) -> np.ndarray:
    """Biaffine relation scores [P, R]: s^T U_r o + W_r [s;o] + b_r.

    FIXED two-step contraction (tensordot then masked sum) instead of
    einsum(optimize=True): einsum's contraction-path choice depends on
    the operand shapes — including P, the batch's total pair count — so
    the same pair's score could round differently depending on what it
    was co-batched with, violating the batching-independence rule this
    module pins. The explicit order is shape-independent."""
    su = np.tensordot(S, U, axes=([1], [1]))  # [P, R, e]
    bil = (su * O[:, None, :]).sum(axis=2)
    lin = np.concatenate([S, O], axis=1) @ W.T
    return (bil + lin + b[None, :]).astype(np.float32)


def decode_bio(tags: list[int], id_to_tag: list[str]) -> list[tuple[int, int, str]]:
    """BIO tag sequence → half-open spans [(start, end, type)].

    Pinned malformed-tag rule (SURVEY.md A10): a bare ``I-X`` (no
    preceding ``B-X``/``I-X``) is treated as ``B-X``.
    """
    spans: list[tuple[int, int, str]] = []
    cur_start, cur_type = -1, ""
    for i, tid in enumerate(tags):
        tag = id_to_tag[tid]
        if tag == "O":
            if cur_start >= 0:
                spans.append((cur_start, i, cur_type))
                cur_start = -1
            continue
        prefix, etype = tag.split("-", 1)
        if prefix == "B" or cur_start < 0 or etype != cur_type:
            if cur_start >= 0:
                spans.append((cur_start, i, cur_type))
            cur_start, cur_type = i, etype
    if cur_start >= 0:
        spans.append((cur_start, len(tags), cur_type))
    return spans
