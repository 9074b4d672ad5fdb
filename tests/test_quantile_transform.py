"""Quantile transform — relational.data_quantile_transform.

Sketch-approximate CDF ranks must track the exact empirical CDF within
the sketch's rank-error budget, preserve value order, and the
quantile_rank kernel must invert quantile_query."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from antnre_ray.functions.sketch import (
    quantile_merge,
    quantile_partial,
    quantile_query,
    quantile_rank,
)


def test_rank_inverts_query():
    rng = np.random.default_rng(11)
    x = rng.lognormal(0.0, 1.5, 50_000)
    sketch = quantile_merge([quantile_partial(c) for c in np.array_split(x, 17)])
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        v = quantile_query(sketch, q)
        assert quantile_rank(sketch, np.array([v]))[0] == pytest.approx(q, abs=0.02)


def test_rank_matches_exact_cdf():
    rng = np.random.default_rng(5)
    x = rng.normal(10.0, 3.0, 40_000)
    sketch = quantile_merge([quantile_partial(c) for c in np.array_split(x, 9)])
    probes = rng.choice(x, 500, replace=False)
    xs = np.sort(x)
    exact = np.searchsorted(xs, probes, side="left") / len(xs)
    got = quantile_rank(sketch, probes)
    assert np.max(np.abs(got - exact)) < 0.025


def test_transform_on_sf001(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_quantile_transform"]
    assert sql is None
    rows = fn(sf001).take_all()
    df = pd.read_parquet(f"{sf001}/events.parquet", columns=["event_id", "value"])
    assert len(rows) == len(df)
    got = {r["event_id"]: r["q"] for r in rows}
    vals = df.set_index("event_id")["value"]
    xs = np.sort(vals.to_numpy())
    sample = df.sample(300, random_state=3)
    for eid, v in zip(sample["event_id"], sample["value"]):
        exact = np.searchsorted(xs, v, side="left") / len(xs)
        assert got[eid] == pytest.approx(exact, abs=0.03), eid
    # monotone: ranks ordered like values on a sorted probe set
    s = sample.sort_values("value")
    qs = [got[e] for e in s["event_id"]]
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))
    assert all(0.0 <= q <= 1.0 for q in qs)
