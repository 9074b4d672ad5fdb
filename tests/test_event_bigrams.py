"""Sequential bigram mining + chi-square independence."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


def test_event_bigrams_match_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["ts_event_bigrams"]
    assert sql is not None
    out = fn(sf001)
    got = list(zip(out.column("pair").to_pylist(), out.column("n").to_pylist()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf001}/events.parquet')"
    )
    ref = con.execute(
        """
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        )
        SELECT event_type || '→' || nxt AS pair, count(*) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, pair ASC LIMIT 25
        """
    ).fetchall()
    assert got == [(p, n) for p, n in ref]


def test_bigrams_never_cross_users(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                np.array([1, 2, 3], dtype="datetime64[s]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from antnre_ray.pipelines.relational import ts_event_bigrams

    out = ts_event_bigrams(str(tmp_path))
    got = dict(zip(out.column("pair").to_pylist(), out.column("n").to_pylist()))
    assert got == {"a→b": 1}  # b→c would cross the user boundary


def test_chi_square_matches_reference(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b64_chi_square"]
    assert sql is not None
    out = fn(sf001)
    row = {c: out.column(c)[0].as_py() for c in out.column_names}
    df = pd.read_parquet(f"{sf001}/events.parquet", columns=["event_type", "value"])
    ct = pd.crosstab(df["event_type"], df["value"] >= df["value"].mean()).to_numpy().astype(float)
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    assert row["n"] == int(n)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert row["cramers_v"] == pytest.approx(v, abs=1e-5)
