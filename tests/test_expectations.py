"""Data-quality expectations — stages/expect.expectations_report.

Planted violations must fail their rules with exact violation counts;
a clean table passes everything; the registered report over events is
all-green."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from antnre_ray.stages import expect as ex


def _dirty_table():
    return pa.table(
        {
            "id": pa.array([1, 2, 2, 3, None], pa.int64()),          # 1 null, dup key 2
            "v": pa.array([5.0, -3.0, 7.0, 120.0, 50.0], pa.float64()),  # -3 and 120 out of [0,100]
            "cat": pa.array(["a", "b", "zz", "a", "b"], pa.string()),    # one bad value
        }
    )


def test_planted_violations(ray_session):
    ds = ray.data.from_arrow(_dirty_table()).repartition(3)
    report = ex.expectations_report(
        ds,
        [
            ex.not_null("id"),
            ex.unique("id"),
            ex.in_range("v", 0.0, 100.0),
            ex.accepted_values("cat", ["a", "b"]),
            ex.row_count_between(1, 4),
        ],
    )
    rows = {(r["rule"], r["column"]): r for r in report.to_pylist()}
    assert rows[("not_null", "id")]["passed"] is False
    assert rows[("not_null", "id")]["observed"] == 1.0
    assert rows[("unique", "id")]["passed"] is False
    assert rows[("unique", "id")]["observed"] == 1.0  # one duplicated key
    assert rows[("in_range", "v")]["passed"] is False
    assert rows[("in_range", "v")]["observed"] == 2.0
    assert rows[("accepted_values", "cat")]["passed"] is False
    assert rows[("accepted_values", "cat")]["observed"] == 1.0
    assert rows[("row_count_between", "")]["passed"] is False  # 5 rows > 4
    assert rows[("row_count_between", "")]["observed"] == 5.0


def test_clean_table_all_pass(ray_session):
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    report = ex.expectations_report(
        ray.data.from_arrow(t),
        [ex.not_null("id"), ex.unique("id"), ex.in_range("v", 0, 10), ex.row_count_between(1, 10)],
    )
    assert all(r["passed"] for r in report.to_pylist())


def test_null_in_range_counts_as_violation(ray_session):
    t = pa.table({"v": pa.array([1.0, None], pa.float64())})
    report = ex.expectations_report(ray.data.from_arrow(t), [ex.in_range("v", 0, 10)])
    assert report.to_pylist()[0]["observed"] == 1.0


def test_registry_entry_all_green(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["data_quality_report"]
    # promoted to oracle-backed in round 5: five UNION ALL'd SQL aggregates
    # replicate the report exactly (test_oracle_conformance covers the
    # side-by-side match; here we pin the engine-side semantics)
    assert sql is not None and sql.count("UNION ALL") == 4
    report = fn(sf001)
    rows = report.to_pylist()
    assert len(rows) == 5
    assert all(r["passed"] for r in rows)
