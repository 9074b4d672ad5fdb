"""Small-file compaction — sources/io.compact_parquet_dir.

Row multiset must be preserved exactly, small files must merge toward
the target size, already-compact files stay untouched, and a second
run is a no-op."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from antnre_ray.sources.io import compact_parquet_dir


def _write_small_files(d, n=12, rows=50):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        t = pa.table(
            {
                "id": pa.array(range(i * rows, (i + 1) * rows), pa.int64()),
                "v": pa.array([float(i)] * rows, pa.float64()),
            }
        )
        pq.write_table(t, f"{d}/part-{i:04d}.parquet")


def _all_rows(d):
    import glob

    tables = [pq.read_table(p) for p in sorted(glob.glob(f"{d}/*.parquet"))]
    return sorted(pa.concat_tables(tables, promote_options="default").to_pylist(), key=lambda r: r["id"])


def test_compacts_and_preserves_rows(ray_session, tmp_path):
    d = str(tmp_path / "t")
    _write_small_files(d)
    before = _all_rows(d)
    stats = compact_parquet_dir(d, target_bytes=10 * 1024)
    after = _all_rows(d)
    assert after == before
    assert stats["files_before"] == 12
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_files == stats["files_after"] < 12
    assert all(not f.endswith(".tmp") for f in os.listdir(d))


def test_single_big_file_untouched(ray_session, tmp_path):
    d = str(tmp_path / "t")
    os.makedirs(d)
    t = pa.table({"id": pa.array(range(1000), pa.int64())})
    pq.write_table(t, f"{d}/big.parquet")
    stats = compact_parquet_dir(d, target_bytes=1024)  # smaller than the file
    assert stats["bins"] == 0
    assert os.listdir(d) == ["big.parquet"]


def test_second_run_is_noop(ray_session, tmp_path):
    d = str(tmp_path / "t")
    _write_small_files(d, n=8)
    compact_parquet_dir(d, target_bytes=1 << 30)  # everything into one bin
    listing1 = sorted(os.listdir(d))
    stats2 = compact_parquet_dir(d, target_bytes=1 << 30)
    assert stats2["bins"] == 0
    assert sorted(os.listdir(d)) == listing1


def test_new_arrivals_compact_incrementally(ray_session, tmp_path):
    d = str(tmp_path / "t")
    _write_small_files(d, n=6)
    compact_parquet_dir(d, target_bytes=1 << 30)
    before = _all_rows(d)
    # a later writer drops more small files
    for i in range(6, 10):
        t = pa.table(
            {
                "id": pa.array(range(i * 50, (i + 1) * 50), pa.int64()),
                "v": pa.array([float(i)] * 50, pa.float64()),
            }
        )
        pq.write_table(t, f"{d}/part-{i:04d}.parquet")
    stats = compact_parquet_dir(d, target_bytes=1 << 30)
    assert stats["bins"] == 1
    assert len(_all_rows(d)) == len(before) + 200
    # two compacted generations coexist
    comp = [f for f in os.listdir(d) if f.startswith("compacted-")]
    assert len(comp) == 2
