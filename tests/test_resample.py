"""ts_resample_ffill vs a pandas per-user resample/ffill reference, plus
partition invariance (the shard pass must not depend on block layout)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _collect_df(ds):
    import ray

    t = pa.concat_tables(
        [x for x in ray.get(ds.to_arrow_refs()) if x.num_columns > 0],
        promote_options="default",
    )
    return (
        t.to_pandas()
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )


def _pandas_reference(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    out = []
    for uid, g in ev.groupby("user_id"):
        # event_id tie-break mirrors the engine's deterministic order
        # for exact-(user, ts) collisions.
        g = g.sort_values(["ts", "event_id"])
        s = g.set_index("ts")["value"].resample("1h").last().ffill()
        out.append(pd.DataFrame({"user_id": uid, "bucket": s.index, "value": s.values}))
    return (
        pd.concat(out)
        .sort_values(["user_id", "bucket"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_resample_ffill_matches_pandas(sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, _ = load_all()["ts_resample_ffill"]
    got = _collect_df(fn(sf001))
    want = _pandas_reference(sf001)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_resample_ffill_is_partition_invariant(tmp_path, sf001):
    import pyarrow.parquet as pq

    import ray.data

    from antnre_ray.pipelines.registry import load_all

    # Re-shard events into a different block layout at the same path
    # shape and assert identical output.
    ev = pq.read_table(f"{sf001}/events.parquet")
    perm = np.random.default_rng(3).permutation(ev.num_rows)
    pq.write_table(ev.take(pa.array(perm)), tmp_path / "events.parquet")

    fn, _ = load_all()["ts_resample_ffill"]
    a = _collect_df(fn(sf001))
    b = _collect_df(fn(str(tmp_path)))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_resample_ffill_breaks_exact_ts_ties_by_event_id(tmp_path):
    """Two events at the IDENTICAL microsecond: the higher event_id wins
    deterministically, regardless of input row order (the layout-
    dependence a ts-only sort would have)."""
    import pyarrow.parquet as pq

    from antnre_ray.pipelines.registry import load_all

    ts = pd.Timestamp("2025-06-01 10:15:00")
    for order in ([10, 11], [11, 10]):
        tbl = pa.table(
            {
                "user_id": pa.array([7, 7], pa.int64()),
                "ts": pa.array([ts, ts], pa.timestamp("us")),
                "event_id": pa.array(order, pa.int64()),
                "value": pa.array([float(100 + e) for e in order], pa.float64()),
            }
        )
        d = tmp_path / f"o{order[0]}"
        d.mkdir()
        pq.write_table(tbl, d / "events.parquet")
        fn, _ = load_all()["ts_resample_ffill"]
        got = _collect_df(fn(str(d)))
        assert len(got) == 1
        assert got["value"].iloc[0] == 111.0  # event_id 11 wins both times


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname", ["ts_resample_ffill", "ts_interpolate"])
def test_packing_guard_rejects_negative_user_id(tmp_path, qname):
    """A negative user_id would wrap the (uid << 34 | ts_s) composite key
    positive and silently break the searchsorted ordering — the guard
    must RAISE, not mis-pack (review finding: the original bound checked
    only uid < 2^29, letting uid <= -(2^29)-1 through)."""
    import pyarrow.parquet as pq

    from antnre_ray.pipelines.registry import load_all

    ts = pd.Timestamp("2025-06-01 10:15:00")
    tbl = pa.table(
        {
            "user_id": pa.array([-(2**29) - 1, 7], pa.int64()),
            "ts": pa.array([ts, ts], pa.timestamp("us")),
            "event_id": pa.array([1, 2], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    d = tmp_path / "neg"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    fn, _ = load_all()[qname]
    import ray.exceptions

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)) as ei:
        _collect_df(fn(str(d)))
    assert "user_id" in str(ei.value)
