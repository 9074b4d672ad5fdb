"""Vectorized explodes of the nested extraction results.

All pure Arrow kernel work (flatten + take on list-parent indices) — no
Python row loops — so these run as stateless map_batches stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _parents(col: pa.ChunkedArray | pa.ListArray) -> tuple[pa.ListArray, pa.Array]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col, pc.list_parent_indices(col)


def mentions_batch(batch: pa.Table) -> pa.Table:
    """extractions → one row per mention (doc/sent provenance attached)."""
    ments, parent = _parents(batch.column("mentions"))
    flat = ments.flatten()
    cols = {
        "doc_id": batch.column("doc_id").take(parent),
        "part_id": batch.column("part_id").take(parent),
        "sent_id": batch.column("sent_id").take(parent),
    }
    present = {f.name for f in flat.type}
    for f in ("start", "end", "ent_type", "surface", "score", "entity_id", "link_score"):
        if f in present:
            cols[f] = flat.field(f)
    return pa.table(cols)


def triples_batch(batch: pa.Table) -> pa.Table:
    """extractions → one row per triple, endpoint mention structs resolved.

    Output: doc_id, part_id, sent_id, subj:struct<...mention...>, pred,
    obj:struct<...>, score. Endpoint resolution is an absolute-index
    ``take`` on the flattened mentions — no row loop.
    """
    trips, parent = _parents(batch.column("triples"))
    ments = batch.column("mentions")
    if isinstance(ments, pa.ChunkedArray):
        ments = ments.combine_chunks()
    tflat = trips.flatten()
    mflat = ments.flatten()
    m_off = ments.offsets
    base = m_off.take(parent)  # first-mention index of each triple's sentence
    subj_abs = pc.add(base, tflat.field("subj_idx"))
    obj_abs = pc.add(base, tflat.field("obj_idx"))
    subj = mflat.take(subj_abs)
    obj = mflat.take(obj_abs)

    def _span_struct(s: pa.StructArray) -> pa.StructArray:
        names = ["surface", "ent_type", "start", "end"]
        if "entity_id" in {f.name for f in s.type}:
            names += ["entity_id", "link_score"]
        return pa.StructArray.from_arrays([s.field(n) for n in names], names=names)

    return pa.table(
        {
            "doc_id": batch.column("doc_id").take(parent),
            "part_id": batch.column("part_id").take(parent),
            "sent_id": batch.column("sent_id").take(parent),
            "subj": _span_struct(subj),
            "pred": tflat.field("pred"),
            "obj": _span_struct(obj),
            "score": tflat.field("score"),
        }
    )


def mentions_table(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(mentions_batch, batch_format="pyarrow", zero_copy_batch=True)


def triples_table(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(triples_batch, batch_format="pyarrow", zero_copy_batch=True)
