"""A19 — graph materialization: triples → sorted adjacency shards.

Rewrites triples onto node ids (already resolved per-batch by the
linker — no join needed), aggregates duplicate edges with a per-batch
Arrow combiner BEFORE the shuffle (weight = count, bounded distinct doc
provenance), merges per (src, pred, dst), globally sorts, and writes
one file per block — block boundaries are the shard boundaries
(BASELINE.json:6 "graph materialization as sorted adjacency shards
written back to Lance"; Parquet fallback via sources/io.py).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import PipelineConfig
from ..sources.io import write_table

ADJACENCY_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("pred", pa.string()),
        ("dst", pa.string()),
        ("weight", pa.int64()),
        ("docs", pa.list_(pa.string())),
    ]
)


def edges_batch(batch: pa.Table) -> pa.Table:
    """Combiner: exploded linked triples → partial edges for this batch."""
    t = pa.table(
        {
            "src": batch.column("subj").combine_chunks().field("entity_id")
            if isinstance(batch.column("subj"), pa.ChunkedArray)
            else batch.column("subj").field("entity_id"),
            "pred": batch.column("pred"),
            "dst": batch.column("obj").combine_chunks().field("entity_id")
            if isinstance(batch.column("obj"), pa.ChunkedArray)
            else batch.column("obj").field("entity_id"),
            "doc_id": batch.column("doc_id"),
        }
    )
    g = t.group_by(["src", "pred", "dst"]).aggregate([([], "count_all"), ("doc_id", "distinct")])
    return g.rename_columns(["src", "pred", "dst", "weight", "docs"])


def _merge_edges(group: pa.Table, max_docs: int = 16) -> pa.Table:
    """Reducer: merge partial edges of one (src, pred, dst) group."""
    weight = sum(group.column("weight").to_pylist())
    docs: set[str] = set()
    for lst in group.column("docs").to_pylist():
        docs.update(lst)
    docs_out = sorted(docs)[:max_docs]
    return pa.table(
        {
            "src": pa.array([group.column("src")[0].as_py()], pa.string()),
            "pred": pa.array([group.column("pred")[0].as_py()], pa.string()),
            "dst": pa.array([group.column("dst")[0].as_py()], pa.string()),
            "weight": pa.array([weight], pa.int64()),
            "docs": pa.array([docs_out], pa.list_(pa.string())),
        },
        schema=ADJACENCY_SCHEMA,
    )


def materialize_graph(
    triples: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    """exploded linked triples → sorted adjacency Dataset."""
    cfg = cfg or PipelineConfig()
    partial = triples.map_batches(edges_batch, batch_format="pyarrow", zero_copy_batch=True)
    merged = partial.groupby(["src", "pred", "dst"]).map_groups(
        _merge_edges, batch_format="pyarrow", fn_kwargs={"max_docs": cfg.max_docs_per_edge}
    )
    return merged.sort(["src", "pred", "dst"])


def merge_adjacency(
    existing: ray.data.Dataset,
    new_triples: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
) -> ray.data.Dataset:
    """Incremental A19: existing adjacency shards + NEW triples → updated
    shards, without re-reducing the old corpus — how a 10^12-document KG
    actually ingests (re-materializing everything per increment would be
    a full-corpus job).

    Existing edges re-enter the reduce as partials: the adjacency schema
    IS the combiner's partial schema (weight, capped doc list), so one
    union + the same grouped reducer merges them. Equivalence with a
    full rebuild holds exactly: weights add, and for the bounded
    provenance the lowest-k of a union is contained in the union of each
    side's lowest-k (x among the k smallest of A∪B and x∈A ⇒ fewer than
    k elements of A are below x), so cap(cap(A) ∪ cap(B)) == cap(A ∪ B).
    Tested against the from-scratch build in tests/test_link_canonicalize.
    """
    cfg = cfg or PipelineConfig()
    new_partial = new_triples.map_batches(edges_batch, batch_format="pyarrow", zero_copy_batch=True)
    merged = existing.union(new_partial).groupby(["src", "pred", "dst"]).map_groups(
        _merge_edges, batch_format="pyarrow", fn_kwargs={"max_docs": cfg.max_docs_per_edge}
    )
    return merged.sort(["src", "pred", "dst"])


def write_adjacency(adj: ray.data.Dataset, path: str) -> None:
    write_table(adj, path)


def materialize_local(triples: pa.Table, max_docs: int = 16) -> pa.Table:
    """No-Ray reference twin (tests/goldens): same combiner + reducer."""
    import pyarrow.compute as pc

    partial = edges_batch(triples)
    keys = sorted(
        {
            (s, p, d)
            for s, p, d in zip(
                partial.column("src").to_pylist(),
                partial.column("pred").to_pylist(),
                partial.column("dst").to_pylist(),
            )
        }
    )
    out = []
    for s, p, d in keys:
        m = pc.and_(
            pc.and_(pc.equal(partial.column("src"), s), pc.equal(partial.column("pred"), p)),
            pc.equal(partial.column("dst"), d),
        )
        out.append(_merge_edges(partial.filter(m), max_docs=max_docs))
    return pa.concat_tables(out) if out else pa.Table.from_pylist([], schema=ADJACENCY_SCHEMA)
