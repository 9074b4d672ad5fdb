"""Generate the wide-query scaling input: lineitem + orders from an sf
dir, replicated N times with per-replica ORDER-KEY OFFSETS so the join
fan-out per key is unchanged (each replica joins only within itself —
the scaled job is N independent copies of the base join, which is
exactly what a cluster N times the size would shuffle).

Deterministic: pure replication + arithmetic on the driver-written
testdata, no RNG. Written once to --output; bench.py --scaling-query
then takes it via GRAFT_SF_DIR. Replication happens OUTSIDE the timed
legs — the legs read the same parquet a real job would.

Usage:
    python jobs/gen_join_scale_input.py \
        --input /root/testdata/sf0.1 --repeat 16 --output /tmp/sfq_x16
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key stride between replicas: > any real orderkey at sf<=1, so
# replica key ranges never collide
KEY_STRIDE = 1 << 32


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=16)
    ap.add_argument("--output", default="/tmp/sfq_x16")
    args = ap.parse_args()

    # ONE FILE PER REPLICA, not one giant file: Ray creates one read
    # task per parquet fragment, so a single-file table serializes the
    # entire scan through one task (measured: 188 MB single-file read =
    # 3.6 s serial at ANY cpu count) — and a real 100-TB table is many
    # files anyway.
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = pq.read_table(os.path.join(args.input, f"{name}.parquet"))
        # the engine's _read resolves "{sf_dir}/{table}.parquet"; a
        # DIRECTORY by that name holding part files reads identically
        tdir = os.path.join(args.output, f"{name}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for r in range(args.repeat):
            t = src
            if r:
                shifted = pc.add(src.column(key), pa.scalar(r * KEY_STRIDE, pa.int64()))
                t = src.set_column(src.schema.get_field_index(key), key, shifted)
            pq.write_table(t, os.path.join(tdir, f"part-{r:05d}.parquet"))
        print(f"{name}: {src.num_rows} x{args.repeat} -> {src.num_rows * args.repeat} rows, {args.repeat} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
