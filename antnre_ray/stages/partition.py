"""Quantile-boundary range partitioning (the production path the b40
docstring names): derive n-partition range boundaries for a column from
the mergeable compressed-CDF quantile sketch (functions/sketch.py), so
range-partitioned operators (global row number / rank, range-partitioned
sort-merge writes) get BALANCED buckets on any distribution instead of
fixed calendar/width walls. One streaming pass, 4 KB per block on the
wire, boundaries are driver-tiny (n_parts − 1 floats) and broadcast.

Balance is approximate (sketch rank error ≤ ~1-2.5%); correctness of the
downstream operator must never depend on it — boundaries only steer
parallelism (the b40 contract: any boundaries partition the sort order).
Rows equal to boundary b_i all land in partition i (searchsorted
side='left'; ranges are (b_{i-1}, b_i]), so ties never straddle two
partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.fold import tree_fold
from ..functions.sketch import quantile_merge, quantile_partial, quantile_query


def quantile_range_boundaries(
    ds: ray.data.Dataset, col: str, n_parts: int, *, _cast=None
) -> np.ndarray:
    """Return ``n_parts − 1`` boundary values for `col` such that the
    ranges (−inf, b0], (b0, b1], …, (b_{n−2}, +inf) hold ≈ equal row
    counts. One map_batches pass emits a ≤256-point weighted-CDF sketch
    per block; a tree_fold level merges those to ≤16 sketches before
    the driver's final merge + quantile reads (the extra compression
    level adds ≈1/m rank error — callers are balance-only, and the
    driver never holds O(num_blocks) sketches)."""

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False)
        if _cast is not None:
            x = _cast(x)
        pts = quantile_partial(np.asarray(x, dtype=np.float64))
        return pa.table({"pts": pa.array([pts.reshape(-1).tolist()], pa.list_(pa.float64()))})

    def merge_sketches(b: pa.Table) -> pa.Table:
        m = quantile_merge(
            [np.asarray(x, dtype=np.float64).reshape(-1, 2) for x in b.column("pts").to_pylist()]
        )
        return pa.table({"pts": pa.array([m.reshape(-1).tolist()], pa.list_(pa.float64()))})

    parts = tree_fold(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge_sketches,
    )
    sketch = quantile_merge(
        [np.asarray(p["pts"], dtype=np.float64).reshape(-1, 2) for p in parts]
    )
    return np.array(
        [quantile_query(sketch, i / n_parts) for i in range(1, n_parts)], dtype=np.float64
    )


def assign_range_partition(values: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
    """Vectorized partition id per value (int64). Values equal to
    boundary b_i all land in partition i (side='left' ⇒ ranges are
    (b_{i−1}, b_i]), keeping ties co-located so range-ordered operators
    stay exact."""
    return np.searchsorted(boundaries, np.asarray(values, dtype=np.float64), side="left").astype(
        np.int64
    )


# ----------------------------------------- Z-order (Morton) clustering

def zorder_interleave(codes: list[np.ndarray], bits: int) -> np.ndarray:
    """Interleave the low ``bits`` bits of k equal-length uint64 code
    arrays into one Morton key (column j contributes bit i to output
    position i·k + j). Vectorized: bits × k shift/or passes, no Python
    per row. k·bits must fit in 63 bits."""
    k = len(codes)
    if k * bits > 63:
        raise ValueError(f"zorder: {k} cols × {bits} bits exceeds 63-bit keys")
    n = len(codes[0])
    z = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for i in range(bits):
        for j, c in enumerate(codes):
            z |= ((c >> np.uint64(i)) & one) << np.uint64(i * k + j)
    return z


def _minmax_scale_params(ds: ray.data.Dataset, cols: list[str]) -> dict[str, tuple[float, float]]:
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"lo_{c}"), Max(c, alias_name=f"hi_{c}")]
    row = ds.aggregate(*aggs)
    return {c: (float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in cols}


def zorder_sort(
    ds: ray.data.Dataset,
    cols: list[str],
    bits: int = 16,
    keep_code: bool = False,
) -> ray.data.Dataset:
    """Cluster rows along a Z-order (Morton) space-filling curve over
    ``cols`` — the multi-column data-layout step before a partitioned
    write: rows close in EVERY named column land in the same output
    range, so min/max row-group pruning works for predicates on any
    subset of the columns (a single-column sort only serves its own
    column). Numeric columns only; each is min-max scaled to ``bits``
    bits with one global aggregate pass (driver-tiny), codes are
    interleaved vectorized per batch, and one range sort on the 63-bit
    key does the clustering. NaN/null scale to code 0 (they cluster
    together at the low end). ``keep_code=True`` retains the ``_z``
    column for downstream bucketing.

    Scale shape: one cheap aggregate + one map_batches + ONE global
    sort (the unavoidable all-to-all — this operator exists to pay it
    once at layout time so every later scan prunes)."""
    params = _minmax_scale_params(ds, cols)
    top = float(2**bits - 1)

    def add_z(b: pa.Table) -> pa.Table:
        n = b.num_rows
        codes = []
        for c in cols:
            x = b.column(c)
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            v = x.to_numpy(zero_copy_only=False).astype(np.float64)
            lo, hi = params[c]
            span = hi - lo
            scaled = np.zeros(n, dtype=np.float64) if span <= 0 else (v - lo) / span * top
            scaled = np.nan_to_num(scaled, nan=0.0, posinf=top, neginf=0.0)
            codes.append(np.clip(scaled, 0.0, top).astype(np.uint64))
        z = zorder_interleave(codes, bits)
        return b.append_column("_z", pa.array(z.astype(np.int64), pa.int64()))

    out = ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True).sort("_z")
    if keep_code:
        return out

    def drop_z(b: pa.Table) -> pa.Table:
        return b.drop_columns(["_z"])

    return out.map_batches(drop_z, batch_format="pyarrow", zero_copy_batch=True)


def zorder_pruning_stats(
    ds: ray.data.Dataset,
    cols: list[str],
    box: dict[str, tuple[float, float]],
    bits: int = 16,
    bucket_bits: int = 8,
) -> pa.Table:
    """Layout-quality probe: bucket rows by their Z-key prefix
    (deterministic — a pure function of values, independent of block
    boundaries), compute each bucket's per-column min/max envelope, and
    report what fraction of buckets a ``box`` predicate could prune via
    min/max stats, against the same-bucket-count baseline of sorting by
    the FIRST column alone. Returns one row:
    (n_buckets, frac_pruned_zorder, frac_pruned_col0_sort)."""
    params = _minmax_scale_params(ds, cols)
    top = float(2**bits - 1)
    k = len(cols)
    shift = np.uint64(max(k * bits - bucket_bits, 0))

    def bucket_minmax(b: pa.Table) -> pa.Table:
        n = b.num_rows
        codes, raw = [], {}
        for c in cols:
            x = b.column(c)
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            v = x.to_numpy(zero_copy_only=False).astype(np.float64)
            raw[c] = v
            lo, hi = params[c]
            span = hi - lo
            scaled = np.zeros(n, dtype=np.float64) if span <= 0 else (v - lo) / span * top
            scaled = np.nan_to_num(scaled, nan=0.0, posinf=top, neginf=0.0)
            codes.append(np.clip(scaled, 0.0, top).astype(np.uint64))
        zb = (zorder_interleave(codes, bits) >> shift).astype(np.int64)
        # baseline layout: bucket by the first column's scaled code alone
        cb = (codes[0] >> np.uint64(max(bits - bucket_bits, 0))).astype(np.int64)
        out = {"zb": pa.array(zb, pa.int64()), "cb": pa.array(cb, pa.int64())}
        for c in cols:
            out[c] = pa.array(raw[c], pa.float64())
        t = pa.table(out)
        aggs = [(c, "min") for c in cols] + [(c, "max") for c in cols]
        g = t.group_by(["zb", "cb"]).aggregate(aggs)
        return g

    # per-batch combiner above caps the shuffle at |buckets| rows/batch;
    # the global reduce is a tiny grouped min/max
    partial = ds.map_batches(bucket_minmax, batch_format="pyarrow", zero_copy_batch=True)

    def frac_pruned(tbl: pa.Table, key: str) -> tuple[int, float]:
        aggs = [(f"{c}_min", "min") for c in cols] + [(f"{c}_max", "max") for c in cols]
        g = tbl.group_by([key]).aggregate(aggs)
        keep = np.ones(g.num_rows, dtype=bool)
        for c in cols:
            lo_q, hi_q = box[c]
            bmin = g.column(f"{c}_min_min").to_numpy(zero_copy_only=False)
            bmax = g.column(f"{c}_max_max").to_numpy(zero_copy_only=False)
            keep &= (bmax >= lo_q) & (bmin <= hi_q)
        n = g.num_rows
        return n, float((~keep).sum()) / max(n, 1)

    import ray as _ray

    tables = [t for t in _ray.get(partial.to_arrow_refs()) if t.num_columns > 0]
    allt = pa.concat_tables(tables, promote_options="default")
    nz, fz = frac_pruned(allt, "zb")
    nc, fc = frac_pruned(allt, "cb")
    return pa.table(
        {
            "n_buckets_zorder": pa.array([nz], pa.int64()),
            "n_buckets_col0": pa.array([nc], pa.int64()),
            "frac_pruned_zorder": pa.array([round(fz, 6)], pa.float64()),
            "frac_pruned_col0_sort": pa.array([round(fc, 6)], pa.float64()),
        }
    )
