"""Oracle conformance (mirrors the driver's check, __ray_entry__.py):
every SQL-backed query runs on Ray AND DuckDB at sf0.001 and must match
on row count, column names, and exact values (order-insensitive)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle(sf001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf001}/{t}.parquet')")
    return con


def _canon(x) -> pd.DataFrame:
    import ray
    import ray.data

    if isinstance(x, ray.data.Dataset):
        x = pa.concat_tables(ray.get(x.to_arrow_refs()), promote_options="default")
    if isinstance(x, pa.Table):
        x = x.to_pandas()
    x = x[sorted(x.columns)]
    return x.sort_values(by=list(x.columns)).reset_index(drop=True)


def _all_sql_queries():
    from antnre_ray.pipelines.registry import load_all

    return [(n, fn, sql) for n, (fn, sql) in load_all().items() if sql is not None]


@pytest.mark.usefixtures("ray_session")
def test_all_sql_queries_match_oracle(sf001, oracle):
    failures = []
    for name, fn, sql in _all_sql_queries():
        got = _canon(fn(sf001))
        want = _canon(oracle.execute(sql).fetchdf())
        try:
            assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} != {list(want.columns)}"
            assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        except AssertionError as e:
            failures.append(f"{name}: {str(e).splitlines()[0]}")
    assert not failures, "\n".join(failures)


@pytest.mark.usefixtures("ray_session")
def test_rows_only_queries_run(sf001):
    """SQL-less queries (sketches, samples, KG ops handled elsewhere)
    must at least execute and return a well-formed result."""
    import ray.data

    from antnre_ray.pipelines.registry import load_all

    for name, (fn, sql) in load_all().items():
        if sql is not None or name.startswith("kg_"):
            continue
        out = fn(sf001)
        if isinstance(out, ray.data.Dataset):
            assert out.count() >= 0, name
        else:
            assert out.num_rows >= 0, name
