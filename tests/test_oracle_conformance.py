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


def _to_arrow(x) -> pa.Table | None:
    """Materialize a query result to ONE Arrow table (None for pandas
    results, which carry no Arrow schema to pin)."""
    import ray
    import ray.data

    if isinstance(x, ray.data.Dataset):
        tbls = [t for t in ray.get(x.to_arrow_refs()) if t.num_columns > 0]
        x = pa.concat_tables(tbls, promote_options="default") if tbls else None
    return x if isinstance(x, pa.Table) else None


@pytest.mark.usefixtures("ray_session")
def test_all_sql_queries_match_oracle(sf001, oracle):
    failures = []
    for name, fn, sql in _all_sql_queries():
        raw = fn(sf001)
        tbl = _to_arrow(raw)
        out = tbl if tbl is not None else raw
        got_schema = (
            {f.name: str(f.type) for f in out.schema} if isinstance(out, pa.Table) else None
        )
        want_schema = {
            f.name: str(f.type) for f in oracle.execute(sql).fetch_arrow_table().schema
        }
        got = _canon(out)
        want = _canon(oracle.execute(sql).fetchdf())
        try:
            assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} != {list(want.columns)}"
            # the driver compares Arrow schemas exactly — a DuckDB HUGEINT
            # (decimal128) vs int64 divergence is a red cell even when the
            # values are numerically equal (caught live on b36)
            if got_schema is not None:
                assert got_schema == want_schema, f"{name}: schema {got_schema} != {want_schema}"
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
