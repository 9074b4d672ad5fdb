"""Data-quality expectations over a Dataset — the contract-checking
pass a production table needs before anything trains on it: declare
rules, get one (rule, column, passed, observed, expected) row each.

Scale shape: every streaming rule folds per-batch PARTIALS (null
counts, min/max, row counts, accepted-value misses — a few ints per
batch per rule) in ONE shared map_batches pass over the table;
``unique`` rules are the exception and pay one grouped-count shuffle
per column (exactness requires it — a sketch would false-pass
uniqueness), stated rather than hidden. Nothing row-scale ever reaches
the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.fold import sum_columns_merge, tree_fold


def not_null(column: str) -> dict:
    return {"kind": "not_null", "column": column}


def in_range(column: str, lo: float, hi: float) -> dict:
    return {"kind": "in_range", "column": column, "lo": lo, "hi": hi}


def accepted_values(column: str, values: list) -> dict:
    return {"kind": "accepted_values", "column": column, "values": sorted(values)}


def unique(column: str) -> dict:
    return {"kind": "unique", "column": column}


def row_count_between(lo: int, hi: int) -> dict:
    return {"kind": "row_count_between", "column": "", "lo": lo, "hi": hi}


def expectations_report(ds: "ray.data.Dataset", rules: list[dict]) -> pa.Table:
    """Evaluate ``rules`` against ``ds``; one report row per rule,
    deterministic order (input order). ``passed`` is strict: any
    violating row fails the rule; ``observed`` carries the violation
    count (or the observed row count / duplicate-key count)."""
    streaming = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    def partial(b: pa.Table) -> pa.Table:
        out = {"_rows": pa.array([b.num_rows], pa.int64())}
        for i, r in enumerate(streaming):
            k = r["kind"]
            if k == "row_count_between":
                v = 0  # row count folds from _rows
            elif k == "not_null":
                v = int(b.column(r["column"]).null_count)
            elif k == "in_range":
                col = b.column(r["column"])
                bad = pc.or_kleene(
                    pc.less(col, pa.scalar(r["lo"])), pc.greater(col, pa.scalar(r["hi"]))
                )
                v = int(pc.sum(pc.cast(pc.fill_null(bad, True), pa.int64())).as_py() or 0)
            elif k == "accepted_values":
                col = b.column(r["column"])
                ok = pc.is_in(col, value_set=pa.array(r["values"]))
                v = int(
                    pc.sum(pc.cast(pc.invert(pc.fill_null(ok, False)), pa.int64())).as_py()
                    or 0
                )
            else:
                raise ValueError(f"unknown rule kind {k!r}")
            out[f"v{i}"] = pa.array([v], pa.int64())
        return pa.table(out)

    parts = tree_fold(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        sum_columns_merge,
    )
    n_rows = sum(p["_rows"] for p in parts)
    violations = {i: sum(p[f"v{i}"] for p in parts) for i in range(len(streaming))}

    dup_counts: dict[str, int] = {}
    for r in uniq_rules:
        col = r["column"]

        def keys(b: pa.Table, _c=col) -> pa.Table:
            t = pa.table({"k": b.column(_c)})
            g = t.group_by(["k"]).aggregate([([], "count_all")])
            return g.rename_columns(["k", "c"])

        from ray.data.aggregate import Sum

        counts = (
            ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("k")
            .aggregate(Sum("c", alias_name="c"))
        )

        def dup_partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or b.num_columns == 0:
                return pa.table({"d": pa.array([0], pa.int64())})
            d = pc.sum(
                pc.cast(pc.greater(b.column("c"), pa.scalar(1)), pa.int64())
            ).as_py()
            return pa.table({"d": pa.array([int(d or 0)], pa.int64())})

        dup_counts[col] = sum(
            p["d"]
            for p in tree_fold(
                counts.map_batches(dup_partial, batch_format="pyarrow"),
                sum_columns_merge,
            )
        )

    rows = []
    si = 0
    for r in rules:
        k = r["kind"]
        if k == "unique":
            d = dup_counts[r["column"]]
            rows.append((k, r["column"], d == 0, float(d), "0 duplicated keys"))
        elif k == "row_count_between":
            ok = r["lo"] <= n_rows <= r["hi"]
            rows.append((k, "", ok, float(n_rows), f"[{r['lo']}, {r['hi']}]"))
            si += 1
        else:
            v = violations[si]
            expected = {
                "not_null": "0 nulls",
                "in_range": f"[{r.get('lo')}, {r.get('hi')}]",
                "accepted_values": f"⊆ {r.get('values')}",
            }[k]
            rows.append((k, r["column"], v == 0, float(v), expected))
            si += 1
    return pa.table(
        {
            "rule": pa.array([r[0] for r in rows], pa.string()),
            "column": pa.array([r[1] for r in rows], pa.string()),
            "passed": pa.array([r[2] for r in rows], pa.bool_()),
            "observed": pa.array([r[3] for r in rows], pa.float64()),
            "expected": pa.array([r[4] for r in rows], pa.string()),
        }
    )
