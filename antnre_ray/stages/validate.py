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


def _check_schema(batch: pa.Table) -> None:
    """Batch-level schema gate (structural problems fail the job)."""
    names = set(batch.column_names)
    if not {"doc_id", "spans"} <= names:
        raise SchemaError(f"input must have doc_id+spans, got {sorted(names)}")
    spans_type = batch.schema.field("spans").type
    if not pa.types.is_list(spans_type) or not pa.types.is_struct(spans_type.value_type):
        raise SchemaError(f"spans must be list<struct>, got {spans_type}")
    have = {f.name for f in spans_type.value_type}
    if not REQUIRED_SPAN_FIELDS <= have:
        raise SchemaError(f"span struct needs {REQUIRED_SPAN_FIELDS}, got {have}")


def _row_violations(batch: pa.Table) -> np.ndarray:
    """Per-row violation reason (object array, None = valid).

    Row-level (data, not structure) checks: null doc_id; span offsets
    decreasing within the row (assemble relies on monotonicity).
    """
    n = batch.num_rows
    reasons = np.full(n, None, dtype=object)
    doc_ids = batch.column("doc_id")
    if doc_ids.null_count:
        null_mask = pc.is_null(doc_ids).to_numpy(zero_copy_only=False)
        reasons[null_mask] = "null_doc_id"
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    # A text span with NULL text would crash assemble's join downstream —
    # row-level violation, not a schema problem.
    if len(flat):
        is_text = pc.equal(flat.field("kind"), "text")
        null_text = pc.and_(is_text, pc.is_null(flat.field("text")))
        if pc.any(null_text).as_py():
            row_off = spans.offsets.to_numpy(zero_copy_only=False)
            bad_pos = np.nonzero(null_text.to_numpy(zero_copy_only=False))[0]
            for r in np.unique(np.searchsorted(row_off, bad_pos, side="right") - 1):
                if reasons[r] is None:
                    reasons[r] = "null_text_span"
    if len(flat):
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        row_off = spans.offsets.to_numpy(zero_copy_only=False)
        deltas = np.diff(off)
        boundary = np.zeros(len(off), dtype=bool)
        starts = row_off[1:-1]
        boundary[starts[starts < len(off)]] = True  # each row's first element restarts
        bad_pos = np.nonzero(np.r_[False, (deltas < 0) & ~boundary[1:]])[0]
        if len(bad_pos):
            bad_rows = np.searchsorted(row_off, bad_pos, side="right") - 1
            for r in np.unique(bad_rows):
                if reasons[r] is None:
                    reasons[r] = "decreasing_offsets"
    return reasons


def validate_batch(
    batch: pa.Table, partitions: int = 8, quarantine_dir: str | None = None
) -> pa.Table:
    """Schema gate + fingerprint + partition assignment.

    ``quarantine_dir=None`` (strict, the default): any row-level
    violation fails the batch with :class:`SchemaError` — correct for
    trusted upstream stages. With a directory, violating ROWS are
    side-written there ((doc_id, reason) parquet, one file per task —
    no driver collect, resumable like any partitioned sink) and the
    stream continues with the clean rows: the row-quarantine pattern a
    100 TB ingest needs, where one malformed document must not kill a
    multi-hour job.
    """
    _check_schema(batch)
    reasons = _row_violations(batch)
    bad = reasons != None  # noqa: E711  (elementwise on object array)
    if bad.any():
        if quarantine_dir is None:
            raise SchemaError(
                f"{int(bad.sum())} invalid rows (first: {reasons[bad][0]}); "
                "pass quarantine_dir to side-channel them instead"
            )
        import os

        import pyarrow.parquet as pq

        os.makedirs(quarantine_dir, exist_ok=True)
        qt = pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(bad)),
                "reason": pa.array(reasons[bad].tolist(), pa.string()),
            }
        )
        # Deterministic, content-derived filename: a retried task (or a
        # resumed run over the same batch) REWRITES the same file instead
        # of accumulating uuid-named duplicates — idempotent like the
        # partitioned sinks.
        digest = hashlib.blake2b(digest_size=8)
        for d, r in zip(qt.column("doc_id").to_pylist(), qt.column("reason").to_pylist()):
            digest.update(f"{d}|{r}\x1e".encode())
        pq.write_table(qt, os.path.join(quarantine_dir, f"q-{digest.hexdigest()}.parquet"))
        batch = batch.filter(pa.array(~bad))
    spans = batch.column("spans").combine_chunks()
    doc_ids = batch.column("doc_id")
    part = (stable_u64_array(doc_ids.to_pylist()) % np.uint64(max(partitions, 1))).astype(np.int32)
    return batch.set_column(
        batch.schema.get_field_index("spans"), "spans", spans
    ).append_column("span_fp", pa.array(span_fingerprints(spans), pa.string())).append_column(
        "part_id", pa.array(part, pa.int32())
    )


def validate(
    ds: ray.data.Dataset, partitions: int = 8, quarantine_dir: str | None = None
) -> ray.data.Dataset:
    return ds.map_batches(
        validate_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"partitions": partitions, "quarantine_dir": quarantine_dir},
    )
