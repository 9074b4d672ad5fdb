#!/usr/bin/env python
"""Flagship KG-construction job — the `ray job submit` entry point.

On a real cluster (north rule: fixed multi-node, N and 4N nodes):

    ray job submit --working-dir . -- \
        python jobs/run_flagship.py \
        --input  /data/corpus/documents.parquet \
        --output s3://bucket/kg_out --partitions 64

In this sandbox the Ray jobs CLI is unavailable (`ray[default]`'s
dashboard packages are not installed — verified 2026-08-17), so the
script also runs standalone: it owns a Ray session iff none exists
(the library itself never calls ray.init — driver contract).

The job is RESUMABLE: re-submitting with the same --output skips every
partition whose lineage fingerprint already matches (state/lineage.py);
only failed/missing shards recompute.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run_flagship.py` puts jobs/ (the script dir), not the
# repo root, on sys.path — make the package importable either way
# (ray job submit --working-dir ships the root as cwd too).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents.parquet to derive the corpus from")
    ap.add_argument("--output", required=True, help="output root (lineage, extract shards, entities, adjacency)")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1, help="corpus replication (bench)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # No explicit address: Ray honors RAY_ADDRESS (the `ray job
        # submit` / multi-node path connects to the REAL cluster) and
        # falls back to a local instance otherwise. Hard-coding
        # address="local" here would silently bootstrap a fresh
        # single-node Ray on the job's node and leave the cluster idle.
        ray.init(include_dashboard=False)

    from antnre_ray.config import PipelineConfig
    from antnre_ray.sources.corpus import derive_interleaved, derived_doc_ids
    from antnre_ray.state.lineage import run_flagship_resumable
    from antnre_ray.state.metrics import run_report

    cfg = PipelineConfig(partitions=args.partitions, salt=args.salt)
    t0 = time.time()
    res = run_flagship_resumable(
        lambda: derive_interleaved(args.input, repeat=args.repeat),
        args.output,
        cfg,
        ids_factory=lambda: derived_doc_ids(args.input, repeat=args.repeat, partitions=args.partitions),
    )
    report = run_report(args.output)
    report["wall_s"] = round(time.time() - t0, 2)
    # resume evidence (jobs/stress_resume.py): which partitions this
    # invocation actually extracted vs served from the lineage manifest
    report["processed_partitions"] = sorted(res["processed_partitions"])
    report["skipped_partitions"] = sorted(res["skipped_partitions"])
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
