"""Z-order clustering — stages/partition.zorder_sort / zorder_interleave.

The interleave kernel must match a per-element bit-twiddle reference,
zorder_sort must be a permutation ordered by the Morton key, and on
grid data the Z-layout must prune a 2-D box predicate strictly better
than a single-column sort."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from antnre_ray.stages.partition import (
    zorder_interleave,
    zorder_pruning_stats,
    zorder_sort,
)


def _ref_interleave(vals: list[int], bits: int) -> int:
    z = 0
    k = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


def test_interleave_matches_reference():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**16, 200).astype(np.uint64)
    b = rng.integers(0, 2**16, 200).astype(np.uint64)
    z = zorder_interleave([a, b], 16)
    for i in range(200):
        assert int(z[i]) == _ref_interleave([int(a[i]), int(b[i])], 16)


def test_interleave_three_columns():
    a = np.array([5, 0, 7], dtype=np.uint64)
    b = np.array([3, 1, 7], dtype=np.uint64)
    c = np.array([6, 0, 7], dtype=np.uint64)
    z = zorder_interleave([a, b, c], 3)
    for i in range(3):
        assert int(z[i]) == _ref_interleave([int(a[i]), int(b[i]), int(c[i])], 3)


def test_interleave_rejects_overflow():
    with pytest.raises(ValueError, match="63-bit"):
        zorder_interleave([np.zeros(1, np.uint64)] * 4, 16)


def _grid(n=32):
    # n×n uniform grid
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64))
    return pa.table({"x": xs.ravel(), "y": ys.ravel()})


def test_zorder_sort_is_ordered_permutation(ray_session):
    t = _grid(16)
    ds = ray.data.from_arrow(t).repartition(5)
    out = zorder_sort(ds, ["x", "y"], bits=8, keep_code=True).take_all()
    assert len(out) == t.num_rows
    zs = [r["_z"] for r in out]
    assert zs == sorted(zs)
    # permutation: same multiset of (x, y)
    assert sorted((r["x"], r["y"]) for r in out) == sorted(
        zip(t.column("x").to_pylist(), t.column("y").to_pylist())
    )
    # keep_code=False drops the key column
    no_z = zorder_sort(ds, ["x", "y"], bits=8).take_all()
    assert set(no_z[0]) == {"x", "y"}


def test_zorder_prunes_better_than_single_column_sort(ray_session):
    ds = ray.data.from_arrow(_grid(32)).repartition(4)
    box = {"x": (14.0, 17.0), "y": (14.0, 17.0)}
    stats = zorder_pruning_stats(ds, ["x", "y"], box, bits=10, bucket_bits=8)
    row = {c: stats.column(c)[0].as_py() for c in stats.column_names}
    # a centered box is prunable by Z-order buckets but x-only buckets
    # keep every bucket whose x-range intersects (all y values inside)
    assert row["frac_pruned_zorder"] > row["frac_pruned_col0_sort"]
    assert row["frac_pruned_zorder"] > 0.8


def test_pruning_stats_partition_invariant(ray_session):
    t = _grid(16)
    box = {"x": (6.0, 9.0), "y": (6.0, 9.0)}
    a = zorder_pruning_stats(ray.data.from_arrow(t).repartition(1), ["x", "y"], box)
    b = zorder_pruning_stats(ray.data.from_arrow(t).repartition(9), ["x", "y"], box)
    assert a.equals(b)


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_zorder_layout"]
    assert sql is None
    out = fn(sf001)
    row = {c: out.column(c)[0].as_py() for c in out.column_names}
    assert row["n_buckets_zorder"] > 1
    assert 0.0 <= row["frac_pruned_zorder"] <= 1.0
    # the whole point of the layout: a 2-D box prunes better z-ordered
    assert row["frac_pruned_zorder"] >= row["frac_pruned_col0_sort"]
