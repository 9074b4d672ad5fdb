#!/usr/bin/env python
"""Driver-style dress rehearsal of the correctness sweep window.

Runs the first SWEEP_CAP registry entries exactly the way the external
driver does (__ray_entry__.queries() on the given sf dir, oracle_sql()
side-by-side in DuckDB, columns sorted by name, order-insensitive exact
value compare) and prints one line per query plus a JSON summary.
Queries without an oracle get the driver's weaker rows-only check.

    python jobs/dress_window.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    import duckdb
    import pandas as pd
    import pyarrow as pa

    import __ray_entry__ as e

    q = e.queries()
    sql = e.oracle_sql()
    window = list(q.keys())[:50]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    def canon(x):
        if isinstance(x, ray.data.Dataset):
            tbls = [t for t in ray.get(x.to_arrow_refs()) if t.num_columns > 0]
            x = pa.concat_tables(tbls, promote_options="default") if tbls else pa.table({})
        if isinstance(x, pa.Table):
            x = x.to_pandas()
        x = x[sorted(x.columns)]
        return x.sort_values(by=list(x.columns)).reset_index(drop=True)

    green = red = 0
    for name in window:
        t0 = time.time()
        try:
            got = canon(q[name](args.sf))
            if name in sql:
                want = canon(con.execute(sql[name]).fetch_arrow_table())
                rows = len(got) == len(want)
                schema = list(got.columns) == list(want.columns)
                vals = False
                if rows and schema:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False, check_exact=False,
                            rtol=0, atol=1e-9,
                        )
                        vals = True
                    except AssertionError:
                        vals = False
                ok = rows and schema and vals
                status = "GREEN" if ok else f"RED rows={rows} schema={schema} vals={vals}"
            else:
                ok = True
                status = f"rows_only({len(got)})"
            green += 1 if ok else 0
            red += 0 if ok else 1
            print(f"{name:36s} {status:14s} {time.time()-t0:6.2f}s", flush=True)
        except Exception as ex:  # a crashed query is a red cell, keep sweeping
            red += 1
            print(f"{name:36s} ERROR {type(ex).__name__}: {ex}", flush=True)
    print(json.dumps({"green": green, "red": red, "window": len(window)}))
    ray.shutdown()
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
