"""Hypothesis property tests for the pure kernels — especially the two
round-1 batch-composition bugs (simhash reduceat, char-CNN PAD row):
results must be a pure function of the single input, never of what it
was co-batched with."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=8), min_size=0, max_size=30
)
TEXTS = WORDS.map(" ".join)


@settings(max_examples=30, deadline=None)
@given(doc=TEXTS, others=st.lists(TEXTS, min_size=0, max_size=5), pos=st.integers(0, 5))
def test_simhash_batch_composition_independent(doc, others, pos):
    """A doc's simhash must not change with co-batched docs — including
    EMPTY docs after it (the round-1 reduceat clipping bug)."""
    from antnre_ray.functions.minhash import simhash_signatures

    alone = simhash_signatures([doc])[0]
    pos = min(pos, len(others))
    batch = others[:pos] + [doc] + others[pos:] + [""]
    sig = simhash_signatures(batch)[pos]
    assert sig == alone


@settings(max_examples=30, deadline=None)
@given(doc=TEXTS, others=st.lists(TEXTS, min_size=0, max_size=5), pos=st.integers(0, 5))
def test_minhash_batch_composition_independent(doc, others, pos):
    from antnre_ray.functions.minhash import minhash_signatures

    alone = minhash_signatures([doc])[0]
    pos = min(pos, len(others))
    batch = others[:pos] + [doc] + others[pos:] + [""]
    sig = minhash_signatures(batch)[pos]
    assert np.array_equal(sig, alone)


@settings(max_examples=30, deadline=None)
@given(tok=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=16),
       width=st.integers(1, 24))
def test_char_cnn_feature_width_invariant(tok, width):
    """Token char features are independent of the char-matrix width the
    token was batched into (requires the PAD row to embed to zeros —
    the round-1 bug)."""
    from antnre_ray.functions.model import char_cnn
    from antnre_ray.functions.reference_spec import char_id, get_model

    m = get_model()
    width = max(width, min(len(tok), 16))

    def feat(w):
        ids = np.zeros((1, w), np.int32)
        for p, ch in enumerate(tok[: min(w, 16)]):
            ids[0, p] = char_id(ch)
        return char_cnn(ids, m.char_emb, m.char_W, m.char_b)[0]

    a = feat(min(len(tok), 16))
    b = feat(width)
    # Semantic width-dependence (the round-1 PAD bug) was ~0.11; what
    # remains is float32 BLAS blocking noise from the different matmul
    # shapes (~1e-8), swamped by the ±10 gazetteer biases and excluded
    # from triple identity. Guard the semantics, tolerate the ulps.
    assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()


@settings(max_examples=40, deadline=None)
@given(tags=st.lists(st.integers(0, 8), min_size=0, max_size=20))
def test_decode_bio_spans_well_formed(tags):
    from antnre_ray.functions.model import decode_bio
    from antnre_ray.functions.reference_spec import ENT_TYPES, TAGS

    spans = decode_bio(tags, TAGS)
    for s, e, t in spans:
        assert 0 <= s < e <= len(tags)
        assert t in ENT_TYPES
    # spans are non-overlapping and ordered
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 <= s2


@settings(max_examples=50, deadline=None)
@given(x=st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), nd=st.integers(0, 6))
def test_round_half_away_matches_duckdb(x, nd):
    """The engine-side ROUND replica must agree with DuckDB bit-for-bit
    within the replica's documented domain |x·10^nd| < 1e10.

    Outside it, DuckDB's own ROUND computes the scaled product through
    a different path than IEEE `x * 10^nd` (measured 2026-08-18: the
    products differ in the last place, so boundary values round apart —
    ~1/4000 of draws at |x·10^nd| ≈ 1e12, ~2% at 1e15, ~28% at 1e16;
    hypothesis found x=900719926.3074305, nd=6 landing exactly on such
    a seam). Every oracle-mirroring round in the engine operates on
    cents / 1e4-scaled money / z-scores — products ≤ ~1e9 at the
    driver's scale — and each query is additionally verified hash-exact
    end-to-end at sf0.001 and sf0.01, which would surface any boundary
    hit on the actual data."""
    import duckdb
    from hypothesis import assume

    from antnre_ray.pipelines.relational import _round_half_away

    assume(abs(x) * 10.0**nd < 1e10)
    ours = float(_round_half_away(np.array([x]), nd)[0])
    theirs = duckdb.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE), {nd})").fetchone()[0]
    assert ours == theirs or (np.isnan(ours) and theirs is None), (x, nd, ours, theirs)
