"""Quantile range partitioner balance/exactness + FK audit hard signal
(planted orphans — a clean corpus gives the audit only all-zero rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
class TestQuantileRangePartition:
    def test_boundaries_balance_a_skewed_distribution(self):
        import ray.data

        from antnre_ray.stages.partition import (
            assign_range_partition,
            quantile_range_boundaries,
        )

        # 90% of mass piled near 0, a long tail above: fixed-width
        # walls would put ~everything in one bucket.
        rng = np.random.default_rng(7)
        x = np.concatenate([rng.uniform(0, 1, 9000), rng.uniform(1, 1000, 1000)])
        ds = ray.data.from_arrow(pa.table({"v": pa.array(x)})).repartition(8)
        n_parts = 8
        bounds = quantile_range_boundaries(ds, "v", n_parts)
        assert len(bounds) == n_parts - 1
        assert list(bounds) == sorted(bounds)
        pids = assign_range_partition(x, bounds)
        counts = np.bincount(pids, minlength=n_parts)
        # Sketch rank error is ~1-2.5%; require every bucket within
        # 2x of the even share (fixed-width walls would be ~72x off).
        assert counts.max() <= 2 * len(x) / n_parts, counts.tolist()
        assert counts.min() > 0

    def test_partition_ranges_are_order_consistent(self):
        from antnre_ray.stages.partition import assign_range_partition

        bounds = np.array([10.0, 20.0])
        v = np.array([5.0, 10.0, 10.0, 15.0, 20.0, 25.0])
        pids = assign_range_partition(v, bounds)
        # (−inf,10] → 0, (10,20] → 1, (20,inf) → 2; boundary ties co-locate.
        assert pids.tolist() == [0, 0, 0, 1, 1, 2]
        order = np.argsort(v, kind="stable")
        assert (np.diff(pids[order]) >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_fk_audit_counts_planted_orphans(tmp_path, sf001):
    """Copy the sf0.001 star schema, plant known orphans on three FK
    edges (one per physical plan: broadcast child-fact, anti-join
    fact-fact, broadcast dim-dim), and assert exact counts."""
    import shutil

    from antnre_ray.pipelines.registry import load_all

    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{sf001}/{t}.parquet", tmp_path / f"{t}.parquet")

    orders = pq.read_table(tmp_path / "orders.parquet")
    bad_orders = pa.table(
        {
            c: (
                pa.array([9_000_001, 9_000_002], pa.int64())
                if c == "o_custkey"
                else orders.column(c).slice(0, 2)
            )
            for c in orders.column_names
        }
    ).cast(orders.schema)
    pq.write_table(pa.concat_tables([orders, bad_orders]), tmp_path / "orders.parquet")

    li = pq.read_table(tmp_path / "lineitem.parquet")
    bad_li = pa.table(
        {
            c: (
                pa.array([8_000_001, 8_000_002, 8_000_003], pa.int64())
                if c == "l_orderkey"
                else li.column(c).slice(0, 3)
            )
            for c in li.column_names
        }
    ).cast(li.schema)
    pq.write_table(pa.concat_tables([li, bad_li]), tmp_path / "lineitem.parquet")

    cust = pq.read_table(tmp_path / "customer.parquet")
    bad_cust = pa.table(
        {
            c: (
                pa.array([777], pa.int64()) if c == "c_nationkey" else cust.column(c).slice(0, 1)
            )
            for c in cust.column_names
        }
    ).cast(cust.schema)
    pq.write_table(pa.concat_tables([cust, bad_cust]), tmp_path / "customer.parquet")

    fn, _sql = load_all()["b53_fk_audit"]
    got = {r["rel"]: r["orphans"] for r in fn(str(tmp_path)).to_pylist()}
    assert got["orders.custkey"] == 2
    assert got["lineitem.orderkey"] == 3
    assert got["customer.nationkey"] == 1
    assert got["lineitem.partkey"] == 0
    assert got["lineitem.suppkey"] == 0
