"""Corpus divergence — stages/analyze.corpus_divergence.

Identical sources must land at ≈0, disjoint vocabularies at ≈ln 2
(the JS upper bound), JS must be symmetric, KL nonnegative, and the
result partition-invariant (exact integer counts)."""

from __future__ import annotations

import math

import pytest
import ray

from antnre_ray.stages.analyze import corpus_divergence


def _docs(rows):
    return ray.data.from_items([{"source": s, "text": t} for s, t in rows])


def test_identical_sources_near_zero(ray_session):
    text = "the quick brown fox jumps over the lazy dog " * 5
    ds = _docs([("a", text), ("b", text)] * 10)
    out = corpus_divergence(ds)
    row = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert row["source_a"] == "a" and row["source_b"] == "b"
    assert row["js"] == pytest.approx(0.0, abs=1e-9)
    assert row["kl_ab"] == pytest.approx(0.0, abs=1e-9)


def test_disjoint_vocab_near_ln2(ray_session):
    a = " ".join(f"alpha{i}" for i in range(200))
    b = " ".join(f"beta{i}" for i in range(200))
    out = corpus_divergence(_docs([("a", a)] * 20 + [("b", b)] * 20))
    js = out.column("js")[0].as_py()
    # exact empirical JS: disjoint supports sit at the ln 2 bound, less
    # the few hashed-bucket collisions between the two vocabularies
    assert js == pytest.approx(math.log(2.0), abs=0.02)
    assert out.column("kl_ab")[0].as_py() > 0.5


def test_three_sources_all_pairs_and_symmetry(ray_session):
    rows = [("a", "x y z " * 10), ("b", "x y q " * 10), ("c", "p q r " * 10)]
    out = corpus_divergence(_docs(rows * 5))
    assert out.num_rows == 3  # (a,b) (a,c) (b,c)
    got = {
        (x, y): (ab, ba, js)
        for x, y, ab, ba, js in zip(
            out.column("source_a").to_pylist(),
            out.column("source_b").to_pylist(),
            out.column("kl_ab").to_pylist(),
            out.column("kl_ba").to_pylist(),
            out.column("js").to_pylist(),
        )
    }
    for (x, y), (ab, ba, js) in got.items():
        assert ab >= 0 and ba >= 0 and 0 <= js <= math.log(2.0) + 1e-9
    # a is closer to b (shared x, y) than to c (shares nothing)
    assert got[("a", "b")][2] < got[("a", "c")][2]


def test_partition_invariant(ray_session):
    rows = [("a", f"tok{i} tok{i + 1} filler") for i in range(30)]
    rows += [("b", f"tok{i + 3} other words") for i in range(30)]
    a = corpus_divergence(_docs(rows).repartition(1))
    b = corpus_divergence(_docs(rows).repartition(13))
    assert a.equals(b)


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_corpus_divergence"]
    assert sql is None
    out = fn(sf001)
    assert out.num_rows >= 1
    assert set(out.column_names) == {"source_a", "source_b", "kl_ab", "kl_ba", "js"}
    for js in out.column("js").to_pylist():
        assert 0.0 <= js <= math.log(2.0) + 1e-9
