"""Schema-drift union — sources/io.union_aligned.

Missing columns null-fill, ints and floats widen, column order is
deterministic, incompatible drift raises, and the registered
data_union_evolved query doubles every event_type count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from antnre_ray.sources.io import union_aligned


def test_null_fill_and_widening(ray_session):
    a = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int32()),
                "v": pa.array([1.5, 2.5], pa.float32()),
                "tag": pa.array(["x", "y"], pa.string()),
            }
        )
    )
    b = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([3, 4], pa.int64()),
                "v": pa.array([3.5, 4.5], pa.float64()),
                "extra": pa.array([10, 20], pa.int64()),
            }
        )
    )
    out = union_aligned([a, b])
    t = pa.concat_tables(ray.get(out.to_arrow_refs()), promote_options="default")
    # first-seen column order: a's columns then b's novel ones
    assert t.column_names == ["id", "v", "tag", "extra"]
    assert t.schema.field("id").type == pa.int64()
    assert t.schema.field("v").type == pa.float64()
    rows = {r["id"]: r for r in t.to_pylist()}
    assert rows[1]["extra"] is None and rows[1]["tag"] == "x"
    assert rows[3]["tag"] is None and rows[3]["extra"] == 10
    assert rows[2]["v"] == 2.5 and rows[4]["v"] == 4.5
    assert len(rows) == 4


def test_incompatible_drift_raises(ray_session):
    a = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"k": pa.array(["s"], pa.string())}))
    with pytest.raises(Exception):
        union_aligned([a, b])


def test_three_way_union_counts(ray_session):
    parts = [
        ray.data.from_arrow(pa.table({"id": pa.array(list(range(i * 10, i * 10 + 10)), pa.int64())}))
        for i in range(3)
    ]
    out = union_aligned(parts)
    assert out.count() == 30


def test_registry_entry_doubles_counts(ray_session, sf001):
    import pandas as pd

    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_union_evolved"]
    assert sql is not None
    got = {r["event_type"]: r["n"] for r in fn(sf001).take_all()}
    base = pd.read_parquet(f"{sf001}/events.parquet", columns=["event_type"])
    ref = base.value_counts("event_type").to_dict()
    assert got == {k: 2 * v for k, v in ref.items()}
