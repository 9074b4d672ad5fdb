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
    from ..config import tune_data_context

    tune_data_context()
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


def union_aligned(datasets: "list[ray.data.Dataset]") -> "ray.data.Dataset":
    """Union Datasets whose schemas DRIFTED compatibly — the ingestion
    primitive for corpora written over months by evolving producers:
    older shards miss columns newer ones have, ints widened, floats
    widened. The unified schema comes from pyarrow's permissive
    unify_schemas (null-fill missing columns, numeric widening); each
    input pays ONE vectorized cast-project map_batches, then a plain
    (zero-shuffle) union streams the blocks through. Truly incompatible
    drift (string vs int) raises immediately — silent coercion of real
    type conflicts corrupts corpora.

    Column order follows the first dataset's schema, with columns seen
    only later appended in first-seen order (deterministic regardless
    of input block layout)."""
    import pyarrow as pa

    schemas = [ds.schema().base_schema for ds in datasets]
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    # deterministic column order: first-seen across inputs
    seen: list[str] = []
    for s in schemas:
        for name in s.names:
            if name not in seen:
                seen.append(name)
    fields = [unified.field(n) for n in seen]

    def make_align(have: set):
        def align(b: pa.Table) -> pa.Table:
            cols = []
            for f in fields:
                if f.name in have:
                    c = b.column(f.name)
                    if isinstance(c, pa.ChunkedArray):
                        c = c.combine_chunks()
                    cols.append(c.cast(f.type) if c.type != f.type else c)
                else:
                    cols.append(pa.nulls(b.num_rows, f.type))
            return pa.table(dict(zip([f.name for f in fields], cols)))

        return align

    aligned = [
        ds.map_batches(
            make_align(set(s.names)), batch_format="pyarrow", zero_copy_batch=True
        )
        for ds, s in zip(datasets, schemas)
    ]
    out = aligned[0]
    for d in aligned[1:]:
        out = out.union(d)
    return out


def compact_parquet_dir(
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    delete_inputs: bool = True,
) -> dict:
    """Compact a directory of small Parquet files into ~target_bytes
    files — the table-maintenance pass every streaming writer needs
    (Ray writes one file per block; a resumable run over many shards
    leaves thousands of KB-scale files whose open/footer cost dominates
    later scans).

    Plan: files sorted by name (deterministic), first-fit packed into
    bins up to target_bytes; single-file bins are already compact and
    are left UNTOUCHED. Execute: one Ray task per bin (file-level work
    — the one place raw tasks beat Dataset ops) writes
    ``compacted-<bin>-<nfiles>.parquet`` via a tmp name + atomic rename.
    Inputs are deleted only AFTER every bin has committed, so a crash
    mid-run leaves a readable (partially duplicated at worst: tmp files
    are invisible to read_parquet) directory and a re-run converges.
    Returns {files_before, files_after, bins, bytes_before}."""
    import pyarrow.fs as pafs

    import ray as _ray

    fs, root = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(), path
    )
    infos = [
        i
        for i in fs.get_file_info(pafs.FileSelector(root, recursive=False))
        if i.type == pafs.FileType.File
        and i.base_name.endswith(".parquet")
        and not i.base_name.startswith(("compacted-", "."))
    ]
    infos.sort(key=lambda i: i.base_name)
    bins: list[list] = []
    cur: list = []
    cur_sz = 0
    for i in infos:
        if cur and cur_sz + i.size > target_bytes:
            bins.append(cur)
            cur, cur_sz = [], 0
        cur.append(i)
        cur_sz += i.size
    if cur:
        bins.append(cur)
    multi = [b for b in bins if len(b) > 1]

    @_ray.remote
    def _compact_bin(
        uri_root: str, paths: list[str], out_path: str, tmp_path: str
    ) -> int:
        import pyarrow as pa2
        import pyarrow.fs as pafs2
        import pyarrow.parquet as pq

        # Re-derive the filesystem from the ORIGINAL user URI, not from
        # paths[0]: FileInfo.path as returned by a URI filesystem is
        # scheme-less, so sniffing '://' there silently fell back to
        # LocalFileSystem on object stores (ADVICE r3).
        f2 = (
            pafs2.FileSystem.from_uri(uri_root)[0]
            if "://" in uri_root
            else pafs2.LocalFileSystem()
        )
        tables = [pq.read_table(p, filesystem=f2) for p in paths]
        merged = pa2.concat_tables(tables, promote_options="default")
        pq.write_table(merged, tmp_path, filesystem=f2)
        f2.move(tmp_path, out_path)
        return merged.num_rows

    import hashlib

    futures = []
    for b in multi:
        # content-addressed name: deterministic for a given input set
        # (idempotent re-runs), collision-free across successive runs
        digest = hashlib.sha1("|".join(i.base_name for i in b).encode()).hexdigest()[:12]
        out = f"{root}/compacted-{digest}-{len(b)}.parquet"
        tmp = f"{root}/.compact-{digest}.tmp"
        futures.append(_compact_bin.remote(path, [i.path for i in b], out, tmp))
    _ray.get(futures)  # every bin committed before any input dies
    if delete_inputs:
        for b in multi:
            for i in b:
                fs.delete_file(i.path)
    return {
        "files_before": len(infos),
        "files_after": len(infos) - sum(len(b) for b in multi) + len(multi),
        "bins": len(multi),
        "bytes_before": int(sum(i.size for i in infos)),
    }
