"""Single-pass correlation matrix + grouped z-score normalization
(relational.b56_corr_matrix / data_group_normalize) vs DuckDB.

Both are rows-only in the registry (float partials can never
hash-match an oracle bit-for-bit), so these tests ARE the correctness
gate: DuckDB equality to tight tolerance."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest


COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_corr_matrix_matches_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b56_corr_matrix"]
    assert sql is not None
    out = fn(sf001)
    got = {
        (x, y): c
        for x, y, c in zip(
            out.column("col_x").to_pylist(),
            out.column("col_y").to_pylist(),
            out.column("corr").to_pylist(),
        )
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf001}/lineitem.parquet')"
    )
    for i, x in enumerate(COLS):
        for y in COLS[i:]:
            ref = con.execute(f"SELECT corr({x}, {y}) FROM lineitem").fetchone()[0]
            assert got[(x, y)] == pytest.approx(ref, abs=2e-6), (x, y)
    # diagonal is exactly 1 after rounding
    for c in COLS:
        assert got[(c, c)] == 1.0


def test_corr_partition_invariant(ray_session, sf001):
    """Rounded output identical across block layouts (the fsum fold is
    exact; only per-batch inner products vary, below the 6-decimal
    rounding)."""
    import ray

    from antnre_ray.pipelines.relational import b56_corr_matrix

    a = b56_corr_matrix(sf001)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # force many small blocks
        b = b56_corr_matrix(sf001)
    finally:
        ctx.target_max_block_size = old
    assert a.equals(b)


def test_group_normalize_matches_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_group_normalize"]
    assert sql is not None
    rows = fn(sf001).take_all()
    got = {r["event_id"]: r["z"] for r in rows}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf001}/events.parquet')"
    )
    ref = con.execute(
        """
        SELECT event_id,
               CASE WHEN stddev_pop(value) OVER w > 0
                    THEN (value - avg(value) OVER w) / (stddev_pop(value) OVER w)
                    ELSE 0.0 END AS z
        FROM events
        WINDOW w AS (PARTITION BY event_type)
        ORDER BY event_id
        """
    ).fetchall()
    assert len(rows) == len(ref)
    for eid, z in ref:
        assert got[eid] == pytest.approx(z, abs=2e-6), eid


def test_group_normalize_stats(ray_session, sf001):
    """Each group's z column is mean≈0, std≈1 (or all-zero groups)."""
    from antnre_ray.pipelines.registry import load_all

    fn, _ = load_all()["data_group_normalize"]
    rows = fn(sf001).take_all()
    by_g: dict[str, list[float]] = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(r["z"])
    for g, zs in by_g.items():
        z = np.asarray(zs)
        assert abs(z.mean()) < 1e-4, g
        assert z.std() == pytest.approx(1.0, abs=1e-3) or np.all(z == 0.0), g
