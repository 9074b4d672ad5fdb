"""Model-kernel unit tests (SURVEY.md §5.2): numpy BiLSTM/CRF/biaffine
against hand-computable or brute-force references."""

from __future__ import annotations

import numpy as np
import pytest

from antnre_ray.functions.model import (
    biaffine_score,
    bilstm_forward,
    crf_viterbi,
    decode_bio,
    lstm_forward,
    viterbi_bruteforce,
)


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(20):
        T, K = int(rng.integers(1, 5)), 3
        em = rng.standard_normal((1, T, K)).astype(np.float32)
        trans = rng.standard_normal((K, K)).astype(np.float32)
        start = rng.standard_normal(K).astype(np.float32)
        end = rng.standard_normal(K).astype(np.float32)
        got = crf_viterbi(em, np.array([T], np.int32), trans, start, end)[0, :T]
        want = viterbi_bruteforce(em[0].astype(np.float64), trans, start, end)
        assert list(got) == want, f"trial {trial}"


def test_viterbi_batch_padding_independence():
    """A sentence's decode must not depend on what it was batched with."""
    rng = np.random.default_rng(1)
    K = 4
    trans = rng.standard_normal((K, K)).astype(np.float32)
    start = rng.standard_normal(K).astype(np.float32)
    end = rng.standard_normal(K).astype(np.float32)
    em_a = rng.standard_normal((1, 3, K)).astype(np.float32)
    alone = crf_viterbi(em_a, np.array([3], np.int32), trans, start, end)[0, :3]
    # Batch it with a longer sentence → padding to T=7.
    em_b = rng.standard_normal((1, 7, K)).astype(np.float32)
    batched_em = np.zeros((2, 7, K), np.float32)
    batched_em[0, :3] = em_a[0]
    batched_em[1] = em_b[0]
    both = crf_viterbi(batched_em, np.array([3, 7], np.int32), trans, start, end)
    assert list(both[0, :3]) == list(alone)


def test_lstm_masking_and_batch_independence():
    rng = np.random.default_rng(2)
    D, h = 5, 4
    Wx = rng.standard_normal((D, 4 * h)).astype(np.float32)
    Wh = rng.standard_normal((h, 4 * h)).astype(np.float32)
    b = rng.standard_normal(4 * h).astype(np.float32)
    X1 = rng.standard_normal((1, 3, D)).astype(np.float32)
    m1 = np.ones((1, 3), np.float32)
    solo = lstm_forward(X1, m1, Wx, Wh, b)
    # Same sentence inside a padded batch of 2.
    X2 = np.zeros((2, 6, D), np.float32)
    X2[0, :3] = X1[0]
    X2[1] = rng.standard_normal((6, D))
    m2 = np.zeros((2, 6), np.float32)
    m2[0, :3] = 1.0
    m2[1, :] = 1.0
    batched = lstm_forward(X2, m2, Wx, Wh, b)
    np.testing.assert_allclose(batched[0, :3], solo[0], rtol=0, atol=0)
    # Padded positions emit zeros.
    assert np.all(batched[0, 3:] == 0.0)
    # Reverse direction equally independent.
    solo_r = lstm_forward(X1, m1, Wx, Wh, b, reverse=True)
    batched_r = lstm_forward(X2, m2, Wx, Wh, b, reverse=True)
    np.testing.assert_allclose(batched_r[0, :3], solo_r[0], rtol=0, atol=0)


def test_biaffine_shapes_and_reference():
    rng = np.random.default_rng(3)
    P, d, R = 4, 3, 2
    S = rng.standard_normal((P, d)).astype(np.float32)
    O = rng.standard_normal((P, d)).astype(np.float32)
    U = rng.standard_normal((R, d, d)).astype(np.float32)
    W = rng.standard_normal((R, 2 * d)).astype(np.float32)
    b = rng.standard_normal(R).astype(np.float32)
    got = biaffine_score(S, O, U, W, b)
    for p in range(P):
        for r in range(R):
            want = S[p] @ U[r] @ O[p] + W[r] @ np.concatenate([S[p], O[p]]) + b[r]
            assert abs(got[p, r] - want) < 1e-4


@pytest.mark.parametrize(
    "tags,want",
    [
        (["O", "B-Peop", "I-Peop", "O"], [(1, 3, "Peop")]),
        (["B-Org", "B-Org"], [(0, 1, "Org"), (1, 2, "Org")]),
        # Pinned malformed rule: bare I-X acts as B-X (SURVEY.md A10).
        (["O", "I-Loc", "I-Loc"], [(1, 3, "Loc")]),
        (["B-Peop", "I-Org"], [(0, 1, "Peop"), (1, 2, "Org")]),
        (["O", "O"], []),
        (["B-Loc"], [(0, 1, "Loc")]),
    ],
)
def test_decode_bio(tags, want):
    inv = ["O"] + [f"{p}-{t}" for t in ["Peop", "Org", "Loc", "Other"] for p in ("B", "I")]
    tag_to_id = {t: i for i, t in enumerate(inv)}
    got = decode_bio([tag_to_id[t] for t in tags], inv)
    assert got == want


def test_bilstm_concat_layout():
    rng = np.random.default_rng(4)
    D, h = 3, 2
    params = {
        "Wx_f": rng.standard_normal((D, 4 * h)).astype(np.float32),
        "Wh_f": rng.standard_normal((h, 4 * h)).astype(np.float32),
        "b_f": np.zeros(4 * h, np.float32),
        "Wx_b": rng.standard_normal((D, 4 * h)).astype(np.float32),
        "Wh_b": rng.standard_normal((h, 4 * h)).astype(np.float32),
        "b_b": np.zeros(4 * h, np.float32),
    }
    X = rng.standard_normal((2, 4, D)).astype(np.float32)
    m = np.ones((2, 4), np.float32)
    H = bilstm_forward(X, m, params)
    assert H.shape == (2, 4, 2 * h)
    f = lstm_forward(X, m, params["Wx_f"], params["Wh_f"], params["b_f"])
    np.testing.assert_array_equal(H[..., :h], f)
