"""Per-user EWMA — relational.ts_ewma (affine doubling scan).

The O(log n) scan must match pandas ewm(adjust=False) sequentially per
user, reset at user boundaries, break ties deterministically, and be
partition-invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


ALPHA = 0.3


def _ref_ewma(df: pd.DataFrame) -> dict[int, float]:
    df = df.sort_values(["user_id", "ts", "event_id"])
    out = {}
    for _, g in df.groupby("user_id"):
        z = g["value"].ewm(alpha=ALPHA, adjust=False).mean()
        out.update(dict(zip(g["event_id"], z)))
    return out


def test_matches_pandas_on_sf001(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["ts_ewma"]
    assert sql is not None
    rows = fn(sf001).take_all()
    df = pd.read_parquet(f"{sf001}/events.parquet", columns=["user_id", "ts", "event_id", "value"])
    ref = _ref_ewma(df)
    assert len(rows) == len(df)
    for r in rows:
        assert r["ewma"] == pytest.approx(ref[r["event_id"]], abs=1e-6), r["event_id"]


def test_scan_kernel_tiny_sequence(ray_session, tmp_path):
    """Hand-checkable: one user, values 10, 20, 30 → 10, 13, 18.1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                np.array([1_000_000, 2_000_000, 3_000_000], dtype="datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "value": pa.array([10.0, 20.0, 30.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from antnre_ray.pipelines.relational import ts_ewma

    rows = ts_ewma(str(tmp_path)).take_all()
    got = [r["ewma"] for r in sorted(rows, key=lambda r: r["event_id"])]
    assert got == pytest.approx([10.0, 13.0, 18.1])


def test_resets_at_user_boundary(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                np.array([1, 2, 1, 2], dtype="datetime64[s]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "value": pa.array([100.0, 0.0, 5.0, 5.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from antnre_ray.pipelines.relational import ts_ewma

    rows = {r["event_id"]: r["ewma"] for r in ts_ewma(str(tmp_path)).take_all()}
    # user 2 starts fresh at 5.0 — no bleed from user 1's 100
    assert rows[3] == 5.0 and rows[4] == 5.0
    assert rows[1] == 100.0 and rows[2] == pytest.approx(70.0)


def test_partition_invariant(ray_session, sf001):
    import ray

    from antnre_ray.pipelines.relational import ts_ewma

    a = ts_ewma(sf001).take_all()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024
        b = ts_ewma(sf001).take_all()
    finally:
        ctx.target_max_block_size = old
    assert a == b


# ------------------------------------------- time-decayed (halflife)

def _ref_halflife(df: pd.DataFrame, halflife_s=3600.0) -> dict[int, float]:
    out = {}
    df = df.sort_values(["user_id", "ts", "event_id"])
    for _, g in df.groupby("user_id"):
        z = None
        prev_ts = None
        for eid, ts, v in zip(g["event_id"], g["ts"], g["value"]):
            if z is None:
                z = v
            else:
                dt = (ts - prev_ts).total_seconds()
                a = 2.0 ** (-dt / halflife_s)
                z = a * z + (1.0 - a) * v
            prev_ts = ts
            out[eid] = z
    return out


def test_halflife_matches_loop_reference(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["ts_ewma_halflife"]
    assert sql is not None
    rows = fn(sf001).take_all()
    df = pd.read_parquet(
        f"{sf001}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    ref = _ref_halflife(df)
    assert len(rows) == len(df)
    for r in rows:
        assert r["ewma"] == pytest.approx(ref[r["event_id"]], abs=1e-6), r["event_id"]


def test_halflife_decay_semantics(ray_session, tmp_path):
    """After a long gap the old state barely matters; after a zero gap
    the new value barely matters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                np.array([0, 1, 360001], dtype="datetime64[s]").astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "value": pa.array([100.0, 0.0, 0.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from antnre_ray.pipelines.relational import ts_ewma_halflife

    rows = {r["event_id"]: r["ewma"] for r in ts_ewma_halflife(str(tmp_path)).take_all()}
    # 1 s gap at halflife 3600 s: z ≈ 100 (old state dominates)
    assert rows[2] > 99.9
    # 100 h gap: old state decayed to ~0
    assert rows[3] < 1e-6
