"""tree_fold (functions/fold.py): the VERDICT-r3 fix for O(num_blocks)
driver-side partial folds — one distributed merge level bounds the
driver's list at k rows, and the tree grouping must not change the
result of any integer/sketch fold."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _partials_ds(n_blocks: int, rows_per_block: int = 1):
    """A Dataset with ONE tiny (idx, cnt, n) partial row per block."""
    import ray.data

    rng = np.random.default_rng(7)
    tables = []
    for i in range(n_blocks):
        idx = np.sort(rng.choice(100, size=5, replace=False)).astype(np.int64)
        cnt = rng.integers(1, 10, size=5).astype(np.int64)
        tables.append(
            pa.table(
                {
                    "idx": pa.array([idx.tolist()], pa.list_(pa.int64())),
                    "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
                    "n": pa.array([int(rng.integers(1, 50))], pa.int64()),
                }
            )
        )
    ds = ray.data.from_arrow(tables)
    return ds, tables


def _dense_fold(rows) -> tuple[np.ndarray, int]:
    dense = np.zeros(100, dtype=np.int64)
    total = 0
    for p in rows:
        np.add.at(dense, np.asarray(p["idx"], dtype=np.int64), np.asarray(p["cnt"], dtype=np.int64))
        total += p["n"]
    return dense, total


def _make_merge():
    """Closure, not a module-level fn: Ray workers can't import test
    modules, so the merge must pickle by value."""

    def _merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "idx": pa.array([], pa.list_(pa.int64())),
                    "cnt": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = np.concatenate([np.asarray(x, dtype=np.int64) for x in b.column("idx").to_pylist()])
        cnt = np.concatenate([np.asarray(x, dtype=np.int64) for x in b.column("cnt").to_pylist()])
        uniq, inv = np.unique(idx, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cnt)
        return pa.table(
            {
                "idx": pa.array([uniq.tolist()], pa.list_(pa.int64())),
                "cnt": pa.array([summed.tolist()], pa.list_(pa.int64())),
                "n": pa.array([int(pc.sum(b.column("n")).as_py() or 0)], pa.int64()),
            }
        )

    return _merge


def test_driver_folds_at_most_k_partials(ray_session):
    """100 per-block partials → the driver sees ≤ k=16 rows."""
    from antnre_ray.functions.fold import tree_fold

    ds, tables = _partials_ds(100)
    rows = tree_fold(ds, _make_merge(), k=16)
    assert 0 < len(rows) <= 16
    # and the tree-shaped result equals the flat O(blocks) fold
    flat_rows = [{c: t.column(c)[0].as_py() for c in t.column_names} for t in tables]
    got_dense, got_total = _dense_fold(rows)
    want_dense, want_total = _dense_fold(flat_rows)
    assert got_total == want_total
    np.testing.assert_array_equal(got_dense, want_dense)


def test_rows_per_merge_bound_enforced(ray_session):
    """A merge emitting more rows than declared trips the bound."""
    from antnre_ray.functions.fold import tree_fold

    ds, _ = _partials_ds(40)

    def bad_merge(b: pa.Table) -> pa.Table:
        return b  # no merging at all — rows pass through

    # RuntimeError, not assert: the bound must survive python -O
    with pytest.raises(RuntimeError, match="exceed the declared bound"):
        tree_fold(ds, bad_merge, k=4, rows_per_merge=1)


def test_operators_using_tree_fold_unchanged(ray_session, sf001):
    """tfidf / lm_perplexity / BM25 / KMV / HLL produce the same results
    through the tree as their pre-tree flat folds did (spot values are
    pinned by their own test files; here: determinism across block
    layouts, which the tree must preserve)."""
    import ray

    from antnre_ray.pipelines.registry import load_all

    reg = load_all()
    fn18, _ = reg["b18_approx_distinct"]
    fnh, _ = reg["b18b_hll_distinct"]
    a = fn18(sf001).column("approx_distinct_partkeys")[0].as_py()
    b = fnh(sf001).column("hll_distinct_partkeys")[0].as_py()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # force many more blocks
        a2 = fn18(sf001).column("approx_distinct_partkeys")[0].as_py()
        b2 = fnh(sf001).column("hll_distinct_partkeys")[0].as_py()
    finally:
        ctx.target_max_block_size = old
    assert a == a2 and b == b2
