"""A22 — metrics aggregation: lineage manifest → run report.

Per-stage counters plus skew evidence (per-entity mention max/mean from
the entities output) so a run's health is inspectable without re-reading
the data."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from .lineage import Manifest


def run_report(out_dir: str) -> dict:
    manifest = Manifest(out_dir)
    recs = manifest.records()
    extract = [r for r in recs if r.stage == "extract"]
    graph = [r for r in recs if r.stage == "graph"]
    report = {
        "partitions_done": sum(1 for r in extract if r.status == "done"),
        "partitions_total": len(extract),
        "extraction_rows": sum(r.row_count for r in extract),
        "extract_wall_s": round(sum(r.wall_s for r in extract), 2),
        "graph_wall_s": round(sum(r.wall_s for r in graph), 2),
        "per_partition": [
            {"part": r.partition_id, "rows": r.row_count, "wall_s": round(r.wall_s, 2)}
            for r in extract
        ],
    }
    if graph:
        report["triples"] = graph[0].triple_count
        report.update(json.loads(graph[0].metrics_json))
    # Link hit-rate (A16 health): fraction of mentions resolved through
    # the alias dict / kNN (e: ids) vs canonical fallback (c: ids),
    # sampled from the first extract shard per partition.
    extract_dir = os.path.join(out_dir, "extract")
    if os.path.isdir(extract_dir):
        linked = total = 0
        for part in sorted(os.listdir(extract_dir)):
            pdir = os.path.join(extract_dir, part)
            if not os.path.isdir(pdir):
                continue
            files = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
            if not files:
                continue
            t = pq.read_table(os.path.join(pdir, files[0]), columns=["mentions"])
            col = t.column("mentions").combine_chunks()
            flat = col.flatten()
            if len(flat):
                ids = flat.field("entity_id").to_pylist()
                linked += sum(1 for i in ids if i.startswith("e:"))
                total += len(ids)
        if total:
            report["link_hit_rate"] = round(linked / total, 4)
    ents_dir = os.path.join(out_dir, "entities")
    if os.path.isdir(ents_dir):
        counts = []
        for f in os.listdir(ents_dir):
            t = pq.read_table(os.path.join(ents_dir, f), columns=["mention_count"])
            counts.extend(t.column("mention_count").to_pylist())
        if counts:
            report["skew"] = {
                "max_mentions_per_entity": max(counts),
                "mean_mentions_per_entity": round(sum(counts) / len(counts), 2),
            }
    return report
