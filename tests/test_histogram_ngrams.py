"""Equi-width histogram (b57) + exact top-k n-grams.

Histogram counts must equal a one-shot np.histogram bit-for-bit and be
partition-invariant; top-k bigrams must equal a collections.Counter
reference including tie order."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def test_histogram_matches_numpy(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b57_histogram"]
    assert sql is not None
    out = fn(sf001)
    v = pd.read_parquet(f"{sf001}/events.parquet", columns=["value"])["value"].to_numpy()
    edges = np.linspace(v.min(), v.max(), 21)
    ref, _ = np.histogram(v, bins=edges)
    assert out.column("n").to_pylist() == ref.tolist()
    assert out.column("bin_id").to_pylist() == list(range(20))
    assert sum(out.column("n").to_pylist()) == len(v)


def test_histogram_partition_invariant(ray_session, sf001):
    from antnre_ray.pipelines.relational import b57_histogram

    a = b57_histogram(sf001)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        b = b57_histogram(sf001)
    finally:
        ctx.target_max_block_size = old
    assert a.equals(b)


def _ref_topk(texts, n=2, k=50):
    c = Counter()
    for t in texts:
        toks = (t or "").lower().split()
        c.update(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_topk_ngrams_matches_counter(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["text_topk_ngrams"]
    assert sql is not None
    out = fn(sf001)
    got = list(zip(out.column("ngram").to_pylist(), out.column("n").to_pylist()))
    texts = pd.read_parquet(f"{sf001}/documents.parquet", columns=["text"])["text"]
    assert got == _ref_topk(texts)


def test_topk_ngrams_tiny_planted(ray_session):
    from antnre_ray.stages.analyze import topk_ngrams

    docs = ray.data.from_items(
        [{"text": "a b a b c"}, {"text": "a b x"}, {"text": ""}]
    ).repartition(3)
    out = topk_ngrams(docs, n=2, k=3)
    got = list(zip(out.column("ngram").to_pylist(), out.column("n").to_pylist()))
    # bigrams: "a b"×3, "b a"×1, "b c"×1, "b x"×1 → ties break on ngram ASC
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_topk_unigrams(ray_session):
    from antnre_ray.stages.analyze import topk_ngrams

    docs = ray.data.from_items([{"text": "z z z y y x"}])
    out = topk_ngrams(docs, n=1, k=2)
    got = list(zip(out.column("ngram").to_pylist(), out.column("n").to_pylist()))
    assert got == [("z", 3), ("y", 2)]
