"""The flagship KG-construction pipeline (SURVEY.md §3.2).

    documents ─ A2 validate ─ A3 assemble ─ A4/A5 sentencize
              ─ A15 ExtractorActor ─ [A16 LinkerActor]
              ├─ mentions → A17/A18 canonicalize → entities
              └─ triples  → A19 materialize → adjacency shards

Every stage is lazy — nothing materializes until a sink/aggregate
consumes the stream. ``reference_extractions`` is the no-Ray composition
of the same batch functions, used to generate the golden "reference
emitted triples" (SURVEY.md §7.4.2) that the Ray path must reproduce.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from ..config import PipelineConfig
from ..stages.assemble import assemble, assemble_batch
from ..stages.canonicalize import canonicalize, canonicalize_local
from ..stages.explode import mentions_batch, mentions_table, triples_batch, triples_table
from ..stages.extract import ExtractorActor, extract
from ..stages.link import LinkerActor, build_linker_state, link
from ..stages.materialize import materialize_graph, materialize_local
from ..stages.sentencize import sentencize, sentencize_batch
from ..stages.validate import validate, validate_batch


def extractions_from_documents(
    ds: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    """documents Dataset → extractions Dataset (A2→A15).

    Splits input blocks to ~2 per CPU first: actor-pool parallelism is
    capped by block count (ds.stats() showed 8 extract tasks on a
    16-CPU session when a single parquet file fed the chain).
    """
    cfg = cfg or PipelineConfig()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ds = ds.repartition(max(2 * cpus, 8))
    ds = validate(ds, partitions=cfg.partitions)
    ds = assemble(ds)
    ds = sentencize(ds)
    return extract(ds, cfg)


def linked_extractions(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """documents → extractions with alias/kNN-linked mentions (A2→A16)."""
    return link(extractions_from_documents(ds, cfg), cfg)


def flagship_triples(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """documents Dataset → exploded triples Dataset."""
    return triples_table(extractions_from_documents(ds, cfg))


def flagship_mentions(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    return mentions_table(extractions_from_documents(ds, cfg))


def flagship_graph(
    ds: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> dict[str, ray.data.Dataset]:
    """The full flagship: documents → {triples, entities, adjacency}.

    One extraction+linking stream feeds both wide consumers; the stream
    stays lazy until each output is consumed/written.
    """
    cfg = cfg or PipelineConfig()
    linked = linked_extractions(ds, cfg)
    triples = triples_table(linked)
    mentions = mentions_table(linked)
    entities = canonicalize(mentions, cfg)
    adjacency = materialize_graph(triples, cfg)
    return {"triples": triples, "mentions": mentions, "entities": entities, "adjacency": adjacency}


def reference_graph(docs: pa.Table, cfg: PipelineConfig | None = None) -> dict[str, pa.Table]:
    """Single-process twin of :func:`flagship_graph` (goldens/tests)."""
    cfg = cfg or PipelineConfig()
    ext = reference_extractions(docs, cfg)
    linker = LinkerActor(build_linker_state(), threshold=cfg.link_threshold)
    linked = linker(ext)
    triples = triples_batch(linked)
    mentions = mentions_batch(linked)
    entities = canonicalize_local(mentions, salt=cfg.salt)
    adjacency = materialize_local(triples, max_docs=cfg.max_docs_per_edge)
    return {"triples": triples, "mentions": mentions, "entities": entities, "adjacency": adjacency}


# ------------------------------------------------------ no-Ray reference path

def reference_extractions(docs: pa.Table, cfg: PipelineConfig | None = None) -> pa.Table:
    """Single-process composition of the SAME batch functions — the
    golden-fixture generator. Any divergence between this and the Ray
    path is a pipeline-fidelity bug (batching, ordering, provenance)."""
    cfg = cfg or PipelineConfig()
    t = validate_batch(docs, partitions=cfg.partitions)
    t = assemble_batch(t)
    t = sentencize_batch(t)
    actor = ExtractorActor(seed=cfg.seed, max_mentions=cfg.max_mentions_per_sentence)
    return actor(t)


def reference_triples(docs: pa.Table, cfg: PipelineConfig | None = None) -> pa.Table:
    return triples_batch(reference_extractions(docs, cfg))
