"""A2 — schema gate, span fingerprint, partition assignment.

Validates the input against the pinned interleaved-document schema
(BASELINE.json:15), fingerprints each row's span sequence on
``(kind, text, media_ref, order)`` — the per-row invariant every later
stage must preserve (BASELINE.json:14) — and assigns the deterministic
lineage partition ``part_id = stable_u64(doc_id) % partitions``
(SURVEY.md §4.3.1).

Stateless, zero-copy Arrow in/out; the only Python loop is one blake2b
update per row (id-scale work, not token-scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import stable_u64_array

REQUIRED_SPAN_FIELDS = {"kind", "text", "media_ref", "offset"}


class SchemaError(ValueError):
    pass


def span_fingerprints(spans: pa.ChunkedArray | pa.ListArray) -> list[str]:
    """Order-sensitive per-row digest of (kind, text, media_ref)."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offs = spans.offsets.to_numpy(zero_copy_only=False)
    out: list[str] = []
    for i in range(len(spans)):
        h = hashlib.blake2b(digest_size=8)
        for j in range(offs[i], offs[i + 1]):
            h.update((kinds[j] or "").encode())
            h.update(b"\x1f")
            h.update((texts[j] or "").encode("utf-8", "surrogatepass"))
            h.update(b"\x1f")
            h.update((refs[j] or "").encode())
            h.update(b"\x1e")
        out.append(h.hexdigest())
    return out


def validate_batch(batch: pa.Table, partitions: int = 8) -> pa.Table:
    names = set(batch.column_names)
    if not {"doc_id", "spans"} <= names:
        raise SchemaError(f"input must have doc_id+spans, got {sorted(names)}")
    spans_type = batch.schema.field("spans").type
    if not pa.types.is_list(spans_type) or not pa.types.is_struct(spans_type.value_type):
        raise SchemaError(f"spans must be list<struct>, got {spans_type}")
    have = {f.name for f in spans_type.value_type}
    if not REQUIRED_SPAN_FIELDS <= have:
        raise SchemaError(f"span struct needs {REQUIRED_SPAN_FIELDS}, got {have}")
    if batch.column("doc_id").null_count:
        raise SchemaError("null doc_id")
    # Offsets must be non-decreasing within each row (assemble relies on it).
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    if len(flat):
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        row_off = spans.offsets.to_numpy(zero_copy_only=False)
        deltas = np.diff(off)
        boundary = np.zeros(len(off), dtype=bool)
        starts = row_off[1:-1]
        boundary[starts[starts < len(off)]] = True  # each row's first element restarts
        if len(deltas) and bool((deltas[~boundary[1:]] < 0).any()):
            raise SchemaError("span offsets must be non-decreasing within a row")
    doc_ids = batch.column("doc_id")
    part = (stable_u64_array(doc_ids.to_pylist()) % np.uint64(max(partitions, 1))).astype(np.int32)
    return batch.set_column(
        batch.schema.get_field_index("spans"), "spans", spans
    ).append_column("span_fp", pa.array(span_fingerprints(spans), pa.string())).append_column(
        "part_id", pa.array(part, pa.int32())
    )


def validate(ds: ray.data.Dataset, partitions: int = 8) -> ray.data.Dataset:
    return ds.map_batches(
        validate_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"partitions": partitions},
    )
