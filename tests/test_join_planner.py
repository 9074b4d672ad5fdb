"""Sketch-driven join planner — relational.plan_join / b58_join_planner.

Cardinality estimates must land within KMV error of the true join
sizes, byte-based sizing must pick the real small side, and the wall
must flip the strategy."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray

from antnre_ray.pipelines.relational import plan_join


def _two_tables(ray_session):
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([i % 100 for i in range(10_000)], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(100)) * 3, pa.int64())})
    )
    return left, right


def test_estimates_and_broadcast_side(ray_session):
    left, right = _two_tables(ray_session)
    plan = plan_join(left, right, "k", "k")
    assert plan["strategy"] == "broadcast"
    assert plan["broadcast_side"] == "right"
    assert plan["left_rows"] == 10_000 and plan["right_rows"] == 300
    # KMV ≤10% error on 100 distinct
    assert abs(plan["left_distinct"] - 100) <= 10
    assert abs(plan["right_distinct"] - 100) <= 10
    # true join size: every left row matches 3 right rows = 30_000
    assert abs(plan["est_output_rows"] - 30_000) <= 6_000


def test_wall_flips_strategy(ray_session):
    left, right = _two_tables(ray_session)
    plan = plan_join(left, right, "k", "k", broadcast_bytes=16)
    assert plan["strategy"] == "shuffle" and plan["broadcast_side"] is None


def test_registry_entry_decisions(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b58_join_planner"]
    assert sql is None
    out = fn(sf001)
    rows = {r["join"]: r for r in out.to_pylist()}
    assert rows["orders_customer"]["strategy"] == "broadcast"
    assert rows["lineitem_orders"]["strategy"] == "shuffle"
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf001}/{t}.parquet')"
        )
    true_oc = con.execute(
        "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey"
    ).fetchone()[0]
    true_lo = con.execute(
        "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).fetchone()[0]
    assert 0.5 * true_oc <= rows["orders_customer"]["est_output_rows"] <= 2.0 * true_oc
    assert 0.5 * true_lo <= rows["lineitem_orders"]["est_output_rows"] <= 2.0 * true_lo
