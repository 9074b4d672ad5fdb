"""Randomized oracle conformance for the shard-vectorized reducers
(b14 asof, b27 sessionize, b27b topk, b33 range join, b34 lag).

The sf0.001/sf0.01 conformance sweeps exercise one data distribution;
these tests run the SAME query-vs-DuckDB comparison over seeded random
corpora that plant the edge cases the vectorized cores must get right:
duplicate timestamps (tie handling), users with no orders / orders with
no events (run boundaries), single-row users, and band-boundary hits
(events exactly 30 minutes apart)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "b14_asof_join",
    "b27_sessionize",
    "b27b_topk_per_user",
    "b33_range_join",
    "b34_lag_delta",
    "b35_ntile",
]


def _synth_sf(tmp_path, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n_ev, n_users = 400, 25
    users = rng.integers(1, n_users + 1, n_ev)
    # Coarse time grid (minutes) => plenty of exact ties and exact
    # 30-minute boundary pairs; a few users get bursts of equal ts.
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = rng.integers(0, 60 * 24, n_ev).astype("timedelta64[m]")
    ts = base + offs
    ts[: n_ev // 10] = ts[0]  # a burst of identical timestamps
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "value": pa.array(rng.random(n_ev), pa.float64()),
        }
    )
    n_ord = 60
    # Half the users get orders; dates both before and after the events.
    ord_users = rng.integers(1, n_users // 2 + 1, n_ord)
    ord_dates = base - np.timedelta64(365, "D") + rng.integers(0, 2 * 365, n_ord).astype(
        "timedelta64[D]"
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(ord_users, pa.int64()),
            "o_orderdate": pa.array(ord_dates.astype("datetime64[us]"), pa.timestamp("us")),
        }
    )
    d = tmp_path / f"sf_seed{seed}"
    d.mkdir()
    pq.write_table(events, str(d / "events.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))
    return str(d)


def _canon(x) -> pd.DataFrame:
    import ray

    if isinstance(x, ray.data.Dataset):
        x = pa.concat_tables(
            [t for t in ray.get(x.to_arrow_refs()) if t.num_columns],
            promote_options="default",
        )
    if isinstance(x, pa.Table):
        x = x.to_pandas()
    x = x[sorted(x.columns)]
    return x.sort_values(by=list(x.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 17])
def test_shard_cores_match_oracle_on_random_corpora(tmp_path, seed):
    import duckdb

    from antnre_ray.pipelines.registry import load_all

    sf = _synth_sf(tmp_path, seed)
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    q = load_all()
    for name in QUERIES:
        fn, sql = q[name]
        got = _canon(fn(sf))
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), name
        assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True), name
