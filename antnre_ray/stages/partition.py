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

from ..functions.sketch import quantile_merge, quantile_partial, quantile_query


def quantile_range_boundaries(
    ds: ray.data.Dataset, col: str, n_parts: int, *, _cast=None
) -> np.ndarray:
    """Return ``n_parts − 1`` boundary values for `col` such that the
    ranges (−inf, b0], (b0, b1], …, (b_{n−2}, +inf) hold ≈ equal row
    counts. One map_batches pass emits a ≤256-point weighted-CDF sketch
    per block; the merge and the quantile reads run on the driver."""

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False)
        if _cast is not None:
            x = _cast(x)
        pts = quantile_partial(np.asarray(x, dtype=np.float64))
        return pa.table({"pts": pa.array([pts.reshape(-1).tolist()], pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
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
