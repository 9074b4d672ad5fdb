"""ts_anomaly_zscore: DuckDB oracle equality plus the round-5 overflow
hardening (ADVICE r4: the old shard-global int64 cumsum of cents² could
wrap silently at scale; the kernel now uses direct 6-tap window sums
bounded at 6·max(v²) with a loud guard)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_parquet(tmp_path, values, n_users=7, seed=3):
    """Write an events table shaped like testdata's (user_id, ts,
    event_id, value, event_type)."""
    rng = np.random.default_rng(seed)
    n = len(values)
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "ts": pa.array(
                np.datetime64("2024-01-01", "us")
                + np.sort(rng.integers(0, 10**9, n)).astype("timedelta64[us]")
            ),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "value": pa.array(np.asarray(values, np.float64)),
            "event_type": pa.array(["e"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_anomaly_zscore_matches_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["ts_anomaly_zscore"]
    assert sql is not None
    got = (
        pa.concat_tables(
            [t for t in __import__("ray").get(fn(sf001).to_arrow_refs()) if t.num_columns]
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf001}/events.parquet')"
    )
    want = con.execute(sql).df().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_anomaly_zscore_large_exact_values(ray_session, tmp_path):
    """Values near the per-row bound stay exact (the direct window sums
    never touch a shard-global running total, so magnitude no longer
    compounds with shard length)."""
    from antnre_ray.pipelines.relational import ts_anomaly_zscore

    # ~$12.3M rows -> cents ~1.23e9, right under the 1.238e9 guard;
    # q per window ~ 6 * 1.5e18 would have overflowed a GLOBAL cumsum
    # after a handful of rows.
    rng = np.random.default_rng(11)
    values = rng.uniform(12_370_000.0, 12_379_000.0, 400)
    sf = _events_parquet(tmp_path, values)
    out = ts_anomaly_zscore(sf)
    rows = pa.concat_tables(
        [t for t in __import__("ray").get(out.to_arrow_refs()) if t.num_columns]
    ).to_pandas()
    assert len(rows) == 400
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    from antnre_ray.pipelines.registry import load_all

    _, sql = load_all()["ts_anomaly_zscore"]
    want = con.execute(sql).df().sort_values("event_id").reset_index(drop=True)
    got = rows.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_anomaly_zscore_overflow_guard(ray_session, tmp_path):
    """|cents| past the 6·v² int64 bound raises loudly instead of
    wrapping."""
    from antnre_ray.pipelines.relational import ts_anomaly_zscore

    sf = _events_parquet(tmp_path, [2.0e7] * 8)  # cents = 2e9 > 1.238e9
    with pytest.raises(Exception) as ei:
        ts_anomaly_zscore(sf).materialize()
    assert "overflow" in str(ei.value).lower()
