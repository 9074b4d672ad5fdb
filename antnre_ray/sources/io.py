"""Storage facade: Lance when importable, Parquet otherwise (A1/B2/B3).

The north rule names Lance as the document/shard store
(BASELINE.json:14,15). ``lance``/``pylance`` is NOT installed in this
sandbox and there is no network (SURVEY.md §1.3 caveat), so every
read/write goes through this facade: it uses ``ray.data.read_lance`` /
``Dataset.write_lance`` when the `lance` package imports, else falls
back to Parquet with identical logical schemas (Lance ↔ Arrow is
lossless for list-of-struct, so the swap is transparent to every stage).

Library code never calls ray.init (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import importlib.util
import os

import ray.data

HAVE_LANCE = importlib.util.find_spec("lance") is not None


def read_table(path: str, *, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a stored table (Lance dataset dir or Parquet file/dir).

    Always pass ``columns`` when a stage needs a projection — pruning at
    the read is the cheapest optimization at 100 TB.
    """
    if HAVE_LANCE and (path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    lower = path.lower()
    if lower.endswith((".jsonl", ".json", ".ndjson")) or lower.endswith((".jsonl.gz", ".json.gz")):
        # Ingest format, not a scale path: JSON has no column pushdown,
        # so projection happens post-parse. Convert to parquet/lance for
        # anything read more than once.
        ds = ray.data.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if lower.endswith((".csv", ".csv.gz", ".tsv")):
        if lower.endswith(".tsv"):
            from pyarrow import csv as pacsv

            kwargs.setdefault("parse_options", pacsv.ParseOptions(delimiter="\t"))
        ds = ray.data.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset to Lance when available, else partitioned Parquet.

    Ray writes one file per block — block boundaries are shard
    boundaries, so downstream consumers can resume per shard.
    """
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path, **kwargs)
    elif path.lower().endswith((".jsonl", ".json", ".ndjson")):
        ds.write_json(path, **kwargs)
    elif path.lower().endswith(".csv"):
        ds.write_csv(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def table_exists(path: str) -> bool:
    return os.path.exists(path)
