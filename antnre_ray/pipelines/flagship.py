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

import ray.data

from ..config import PipelineConfig
from ..stages.assemble import assemble, assemble_batch
from ..stages.explode import mentions_table, triples_batch, triples_table
from ..stages.extract import ExtractorActor, extract
from ..stages.sentencize import sentencize, sentencize_batch
from ..stages.validate import validate, validate_batch


def extractions_from_documents(
    ds: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    """documents Dataset → extractions Dataset (A2→A15)."""
    cfg = cfg or PipelineConfig()
    ds = validate(ds, partitions=cfg.partitions)
    ds = assemble(ds)
    ds = sentencize(ds)
    return extract(ds, cfg)


def flagship_triples(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """documents Dataset → exploded triples Dataset."""
    return triples_table(extractions_from_documents(ds, cfg))


def flagship_mentions(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    return mentions_table(extractions_from_documents(ds, cfg))


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
