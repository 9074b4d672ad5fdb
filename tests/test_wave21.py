"""Wave 21: percent_rank window, join-key skew report, winsorize."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


def test_percent_rank_matches_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b62_percent_rank"]
    assert sql is not None
    rows = fn(sf001).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf001}/events.parquet')"
    )
    ref = con.execute(
        """
        SELECT event_id,
               percent_rank() OVER (
                   PARTITION BY user_id ORDER BY value, event_id
               ) AS pr
        FROM events ORDER BY event_id
        """
    ).fetchall()
    assert len(rows) == len(ref)
    for r, (eid, pr) in zip(rows, ref):
        assert r["event_id"] == eid
        assert r["pct_rank"] == pytest.approx(pr, abs=1e-8), eid


def test_skew_report_exact_share(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b63_skew_report"]
    assert sql is not None
    out = fn(sf001)
    row = {c: out.column(c)[0].as_py() for c in out.column_names}
    df = pd.read_parquet(f"{sf001}/lineitem.parquet", columns=["l_orderkey"])
    vc = df["l_orderkey"].value_counts()
    assert row["total_rows"] == len(df)
    # exact: the hottest key is a maximal-count key, counts exact
    assert vc[row["hottest_key"]] == vc.iloc[0]
    assert row["hottest_share"] == pytest.approx(vc.iloc[0] / len(df), abs=1e-6)
    assert row["distinct"] == df["l_orderkey"].nunique()
    assert row["recommended_salts"] >= 1
    assert row["skew_ratio"] > 0


def test_winsorize_bounds_and_fractions(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_winsorize"]
    assert sql is None
    rows = fn(sf001).take_all()
    v = pd.read_parquet(f"{sf001}/events.parquet", columns=["event_id", "value"])
    assert len(rows) == len(v)
    got = np.array([r["value"] for r in rows])
    clipped = np.array([r["clipped"] for r in rows])
    p1, p99 = np.percentile(v["value"], [1, 99])
    # all outputs inside (approximately) the exact percentile band
    span = v["value"].max() - v["value"].min()
    assert got.min() >= p1 - 0.05 * span and got.max() <= p99 + 0.05 * span
    # ~2% of rows clipped (sketch tolerance)
    frac = clipped.mean()
    assert 0.005 <= frac <= 0.06
    # unclipped rows unchanged
    orig = v.set_index("event_id")["value"]
    for r in rows[:500]:
        if not r["clipped"]:
            assert r["value"] == pytest.approx(orig[r["event_id"]], abs=1e-8)
