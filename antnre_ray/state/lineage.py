"""A21 — per-partition lineage + resumable flagship execution.

Two-tier checkpointing (BASELINE.json:6,14 "checkpoint per-partition
lineage and extraction metrics so any failed shard resumes without
recomputation"):

- stage **extract** (the model-bound 99% of compute at corpus scale) is
  checkpointed PER PARTITION: partition p owns docs with
  ``stable_u64(doc_id) % P == p`` (deterministic, SURVEY.md §4.3.1);
  its linked-extraction output lands in ``out/extract/part=p/`` via
  write-then-rename, and a manifest record with the partition's input
  fingerprint marks it done. A rerun skips every partition whose
  fingerprint+status match — only failed/missing shards recompute.
- stage **graph** (the wide shuffles: canonicalize + materialize) is
  checkpointed AS A UNIT, its input fingerprint the hash of all
  partition fingerprints: cheap relative to extraction and global by
  nature, it re-runs on resume only if any input partition changed.

Execution plan: an **ingest** pass derives+validates the corpus once and
lands it hash-partitioned on disk (checkpointed on the corpus
fingerprint — computable from a doc_id-only scan via ``ids_factory``);
pending partitions then extract in **waves** that share ONE actor pool
(a pipeline per partition multiplied the fixed pool-startup cost by P
and measurably anti-scaled), with each partition still marked done
individually. Wave size is the checkpoint cadence knob
(``GRAFT_WAVE_PARTS``): a crash loses at most one wave.

Manifest records are one JSON file per (stage, partition) written
temp-then-rename (atomic on POSIX), so a crash can never leave a
half-written "done" marker. At multi-node scale the manifest dir lives
on shared storage.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import PipelineConfig
from ..functions.hashing import sha256_of_sorted
from ..stages.canonicalize import canonicalize
from ..stages.explode import mentions_table, triples_table
from ..stages.link import build_linker_state, link
from ..stages.materialize import materialize_graph

STAGE_EXTRACT = "extract"
STAGE_GRAPH = "graph"

# Thread-safety shim: this environment has fsspec without aiohttp, so
# `fsspec.implementations.http` fails to import. Ray's path resolution
# imports it on every read and only catches ModuleNotFoundError — but
# when two threads race the failed import, the loser gets a plain
# ImportError ("cannot import name ... from partially initialized
# module") which escapes Ray's handler and kills a partition pipeline.
# Pre-seeding a stub module makes every later import deterministic;
# the sentinel class never matches isinstance checks, so Ray simply
# treats every filesystem as non-HTTP (correct here: all IO is local).
try:
    import fsspec.implementations.http  # noqa: F401
except ImportError:
    import sys as _sys
    import types as _types

    try:
        import fsspec.implementations as _fsimpl

        _stub = _types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:  # sentinel: never instantiated
            pass

        _stub.HTTPFileSystem = _NoHTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = _stub
        _fsimpl.http = _stub
    except Exception:
        pass


@dataclass
class ManifestRecord:
    partition_id: int
    stage: str
    input_fingerprint: str
    row_count: int
    triple_count: int
    status: str  # "done" | "failed"
    metrics_json: str
    wall_s: float


class Manifest:
    """Directory of atomic per-(stage, partition) records."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, stage: str, part: int) -> str:
        return os.path.join(self.dir, f"{stage}-part{part:05d}.json")

    def get(self, stage: str, part: int) -> ManifestRecord | None:
        p = self._path(stage, part)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return ManifestRecord(**json.load(f))

    def put(self, rec: ManifestRecord) -> None:
        p = self._path(rec.stage, rec.partition_id)
        tmp = f"{p}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, p)

    def records(self) -> list[ManifestRecord]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(ManifestRecord(**json.load(f)))
        return out

    def invalidate(self, stage: str, part: int) -> None:
        p = self._path(stage, part)
        if os.path.exists(p):
            os.remove(p)


def _atomic_write(ds: ray.data.Dataset, final_dir: str) -> int:
    """Write a Dataset to ``final_dir`` via temp-dir + rename; returns rows."""
    tmp = f"{final_dir}.tmp.{uuid.uuid4().hex[:8]}"
    ds.write_parquet(tmp)
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows for f in os.listdir(tmp))
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)
    return n


def partition_fingerprint(doc_ids: list[str]) -> str:
    return sha256_of_sorted(doc_ids)


def _cfg_digest(cfg: PipelineConfig) -> str:
    """Digest of every config knob that changes STAGE OUTPUTS. Folded
    into the resume fingerprints so a rerun with a different seed /
    linking threshold / salt re-extracts instead of silently serving
    checkpoints computed under the old config."""
    import hashlib

    key = "|".join(
        str(x)
        for x in (
            cfg.seed,
            cfg.max_mentions_per_sentence,
            cfg.link_threshold,
            cfg.salt,
            cfg.partitions,
            cfg.max_docs_per_edge,
        )
    )
    return hashlib.sha256(key.encode()).hexdigest()[:16]


def run_flagship_resumable(
    corpus_factory,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    ids_factory=None,
) -> dict:
    """Resumable flagship: corpus → per-partition linked extractions →
    global entities + adjacency. Returns paths + which partitions ran.

    ``corpus_factory()`` must return the documents Dataset (doc_id,
    spans) deterministically — it is called per partition (the corpus
    derive/read is cheap next to extraction; see module docstring).
    """
    cfg = cfg or PipelineConfig()
    from ..config import tune_data_context

    tune_data_context()
    os.makedirs(out_dir, exist_ok=True)
    # Sweep tmp dirs a crashed previous run may have left (never referenced
    # by the manifest, so removal is always safe).
    for root, dirs, _files in os.walk(out_dir):
        for d in list(dirs):
            if ".tmp." in d:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                dirs.remove(d)
    manifest = Manifest(out_dir)
    from ..stages.validate import validate

    # ---- ingest: derive + validate ONCE, land a hash-partitioned corpus.
    # One streamed pass; per-partition extract then reads ONLY its own
    # files (partition-pruned), instead of re-deriving the whole corpus
    # per partition. Checkpointed as a unit on the corpus fingerprint.
    # ``ids_factory`` (optional) returns the (doc_id, part_id) table
    # cheaply (e.g. a doc_id-column-only read) so the resume fingerprint
    # check costs a metadata scan, not a corpus derivation.
    if ids_factory is not None:
        ids_tbl = ids_factory()
    else:
        ids_ds = validate(corpus_factory(), partitions=cfg.partitions).select_columns(
            ["doc_id", "part_id"]
        )
        ids_tbl = pa.concat_tables(ray.get(ids_ds.to_arrow_refs()), promote_options="default")
    cfgd = _cfg_digest(cfg)
    fps: dict[int, str] = {}
    for p in range(cfg.partitions):
        mask = pc.equal(ids_tbl.column("part_id"), p)
        fps[p] = partition_fingerprint(ids_tbl.filter(mask).column("doc_id").to_pylist()) + f"|{cfgd}"
    corpus_fp = sha256_of_sorted(f"{p}:{fp}" for p, fp in fps.items())
    corpus_dir = os.path.join(out_dir, "corpus")
    ingest_rec = manifest.get("ingest", 0)
    if not (
        ingest_rec
        and ingest_rec.status == "done"
        and ingest_rec.input_fingerprint == corpus_fp
        and os.path.exists(corpus_dir)
    ):
        t0 = time.time()
        tmp = f"{corpus_dir}.tmp.{uuid.uuid4().hex[:8]}"
        validate(corpus_factory(), partitions=cfg.partitions).write_parquet(
            tmp, partition_cols=["part_id"]
        )
        if os.path.exists(corpus_dir):
            shutil.rmtree(corpus_dir)
        os.replace(tmp, corpus_dir)
        manifest.put(
            ManifestRecord(0, "ingest", corpus_fp, len(ids_tbl), -1, "done", "{}", time.time() - t0)
        )

    processed: list[int] = []
    skipped: list[int] = []
    linker_ref = ray.put(build_linker_state())
    try:
        _cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        _cpus = 8

    stage_dir_root = os.path.join(out_dir, STAGE_EXTRACT)
    # Stale-shard hygiene: extract dirs from a previous run whose
    # partition id is outside the CURRENT cfg.partitions (e.g. the
    # partition count shrank) would otherwise be globbed into the graph
    # stage alongside live ones — delete them up front.
    if os.path.isdir(stage_dir_root):
        live = {f"part_id={p}" for p in range(cfg.partitions)}
        for d in os.listdir(stage_dir_root):
            if d.startswith("part_id=") and d not in live:
                shutil.rmtree(os.path.join(stage_dir_root, d), ignore_errors=True)

    todo: list[int] = []
    for p in range(cfg.partitions):
        rec = manifest.get(STAGE_EXTRACT, p)
        part_dir = os.path.join(stage_dir_root, f"part_id={p}")
        has_corpus = os.path.exists(os.path.join(corpus_dir, f"part_id={p}"))
        if rec and rec.status == "done" and rec.input_fingerprint == fps[p] and os.path.exists(part_dir):
            skipped.append(p)
        elif not has_corpus:  # empty partition: nothing to extract
            # Clear any previous run's output for this now-empty shard —
            # the graph stage reads the whole extract tree.
            shutil.rmtree(part_dir, ignore_errors=True)
            manifest.put(ManifestRecord(p, STAGE_EXTRACT, fps[p], 0, 0, "done", "{}", 0.0))
            processed.append(p)
        else:
            todo.append(p)

    def _extract_wave(parts: list[int]) -> None:
        """ONE pipeline + ONE actor pool for a whole wave of partitions.

        Running a separate Dataset pipeline per partition multiplied the
        fixed actor-pool startup cost by P and measurably anti-scaled
        (pool spinup dominated the model compute); a wave shares the
        pool across its partitions while the manifest still records each
        partition individually — resume granularity stays per-partition,
        at the cost that a crash mid-wave re-extracts that wave only.
        """
        from ..stages.assemble import assemble
        from ..stages.extract import extract
        from ..stages.sentencize import sentencize

        t0 = time.time()
        import pyarrow.fs as pafs

        import numpy as np

        from ..functions.hashing import stable_u64_array

        P = cfg.partitions

        def _fix_part(b: pa.Table) -> pa.Table:
            # part_id is a pure function of doc_id — recompute instead of
            # depending on hive-path inference (which varies with how the
            # file list is given).
            if "part_id" in b.column_names:
                b = b.drop_columns(["part_id"])
            part = (stable_u64_array(b.column("doc_id").to_pylist()) % np.uint64(P)).astype(np.int32)
            return b.append_column("part_id", pa.array(part, pa.int32()))

        # Explicit file list + filesystem: Ray's path resolution has a
        # thread-unsafe fsspec fallback and dir-vs-file ambiguity with an
        # explicit filesystem; listing the files sidesteps both. Block
        # granularity caps pool parallelism (one map task per block), so
        # split the read into ~4 blocks per actor.
        pool_max = max(2, _cpus - 2)
        files = []
        for p in parts:
            d = os.path.join(corpus_dir, f"part_id={p}")
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet"))
        docs_w = (
            ray.data.read_parquet(files, filesystem=pafs.LocalFileSystem())
            .repartition(max(pool_max * 4, 8))
            .map_batches(_fix_part, batch_format="pyarrow")
        )
        import dataclasses

        wave_cfg = dataclasses.replace(cfg, extract_concurrency=(1, pool_max))
        linked = link(extract(sentencize(assemble(docs_w)), wave_cfg), wave_cfg, state_ref=linker_ref)
        tmp = os.path.join(out_dir, f"{STAGE_EXTRACT}.tmp.{uuid.uuid4().hex[:8]}")
        linked.write_parquet(tmp, partition_cols=["part_id"])
        wall = time.time() - t0
        import pyarrow.parquet as pq

        stage_dir = os.path.join(out_dir, STAGE_EXTRACT)
        os.makedirs(stage_dir, exist_ok=True)
        for p in parts:
            src_dir = os.path.join(tmp, f"part_id={p}")
            dst_dir = os.path.join(stage_dir, f"part_id={p}")
            rows = 0
            if os.path.exists(src_dir):
                rows = sum(
                    pq.ParquetFile(os.path.join(src_dir, f)).metadata.num_rows
                    for f in os.listdir(src_dir)
                )
                if os.path.exists(dst_dir):
                    shutil.rmtree(dst_dir)
                os.replace(src_dir, dst_dir)
            else:
                # Zero-output re-extract: CLEAR any previous run's files —
                # an empty marker dir must not leave stale rows behind.
                shutil.rmtree(dst_dir, ignore_errors=True)
                os.makedirs(dst_dir, exist_ok=True)
            manifest.put(
                ManifestRecord(
                    partition_id=p,
                    stage=STAGE_EXTRACT,
                    input_fingerprint=fps[p],
                    row_count=rows,
                    triple_count=-1,
                    status="done",
                    metrics_json=json.dumps({"rows": rows}),
                    wall_s=wall / len(parts),
                )
            )
        shutil.rmtree(tmp, ignore_errors=True)

    if todo:
        # Wave size: all pending partitions by default (one pool). At
        # cluster scale cap via GRAFT_WAVE_PARTS so a wave's output fits
        # the checkpoint cadence you want. Clamped to ≥1 so 0/negative
        # values mean "one wave", not an empty-slice crash.
        wave_parts = max(1, int(os.environ.get("GRAFT_WAVE_PARTS", str(len(todo)))))
        for i in range(0, len(todo), wave_parts):
            _extract_wave(todo[i : i + wave_parts])
        processed.extend(todo)

    # ---- global graph stage (canonicalize + materialize) -------------
    combined_fp = corpus_fp  # same sorted hash over fps — one source of truth
    graph_rec = manifest.get(STAGE_GRAPH, 0)
    ents_dir = os.path.join(out_dir, "entities")
    adj_dir = os.path.join(out_dir, "adjacency")
    graph_ran = False
    if not (
        graph_rec
        and graph_rec.status == "done"
        and graph_rec.input_fingerprint == combined_fp
        and os.path.exists(ents_dir)
        and os.path.exists(adj_dir)
    ):
        t0 = time.time()
        # Explicit file list over the CURRENT run's partitions only —
        # never a whole-tree glob that could pick up shards this run
        # does not own (belt to the stale-dir cleanup's braces).
        extract_files: list[str] = []
        for p in range(cfg.partitions):
            d = os.path.join(out_dir, STAGE_EXTRACT, f"part_id={p}")
            if os.path.isdir(d):
                extract_files.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
                )
        if not extract_files:
            # Legitimately empty corpus: land empty, correctly-schema'd
            # outputs instead of crashing on a missing read path.
            import pyarrow.parquet as _pq

            from ..stages.canonicalize import ENTITIES_SCHEMA
            from ..stages.materialize import ADJACENCY_SCHEMA

            for d, schema in ((ents_dir, ENTITIES_SCHEMA), (adj_dir, ADJACENCY_SCHEMA)):
                shutil.rmtree(d, ignore_errors=True)
                os.makedirs(d, exist_ok=True)
                _pq.write_table(schema.empty_table(), os.path.join(d, "empty.parquet"))
            ents_n = adj_n = trip_n = 0
        else:
            # Block-count sized to the data, not the file count: Ray's
            # default split gave 80 blocks for a <1 MB extract output,
            # and every downstream shuffle (2 sorts in canonicalize, 2
            # in materialize) then pays per-block fixed task costs that
            # dominate the graph stage (measured 3.4 s → 0.95 s for
            # materialize at bench scale). ~16 MB of parquet per block;
            # when the corpus-scale output exceeds file-count × 16 MB
            # the cap is inactive and Ray's own splitting rules apply.
            total_bytes = sum(os.path.getsize(f) for f in extract_files)
            nb = int(total_bytes // (16 << 20)) + 1
            if nb < len(extract_files):
                linked_all = ray.data.read_parquet(extract_files, override_num_blocks=nb)
            else:
                linked_all = ray.data.read_parquet(extract_files)
            # Materialize the (small) exploded triples once: the lazy plan
            # would otherwise re-read + re-explode the extract parquet for
            # the adjacency write AND a third time for the count. Mentions
            # stay lazy (one consumer). The two graph writes are independent
            # pipelines — run them on two threads so canonicalize's shuffle
            # and materialize's sort share the cluster instead of running
            # back-to-back (measured: graph stage 5.8 s → ~3.5 s at 32 CPUs).
            triples = triples_table(linked_all).materialize()
            mentions = mentions_table(linked_all)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_ents = pool.submit(_atomic_write, canonicalize(mentions, cfg), ents_dir)
                f_adj = pool.submit(_atomic_write, materialize_graph(triples, cfg), adj_dir)
                ents_n = f_ents.result()
                adj_n = f_adj.result()
            trip_n = triples.count()
        manifest.put(
            ManifestRecord(
                partition_id=0,
                stage=STAGE_GRAPH,
                input_fingerprint=combined_fp,
                row_count=ents_n,
                triple_count=trip_n,
                status="done",
                metrics_json=json.dumps({"entities": ents_n, "edges": adj_n}),
                wall_s=time.time() - t0,
            )
        )
        graph_ran = True

    return {
        "out_dir": out_dir,
        "processed_partitions": processed,
        "skipped_partitions": skipped,
        "graph_ran": graph_ran,
        "entities": ents_dir,
        "adjacency": adj_dir,
        "manifest": manifest,
    }
