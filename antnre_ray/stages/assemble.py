"""A3 — text assembly: concatenate kind=="text" spans into document text.

Media spans pass through untouched in the ``spans`` column (the per-row
span-sequence invariant, BASELINE.json:14); the assembled ``text``
column is appended. Spans are already offset-ordered (validated by A2),
so assembly is a grouped concatenation: flatten the list column once,
mask text spans, and join per row between list boundaries — C-level
Arrow work plus one ``str.join`` per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def assemble_batch(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    row_off = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat):
        is_text = np.asarray(flat.field("kind").to_numpy(zero_copy_only=False) == "text")
        texts = flat.field("text").to_pylist()
    else:
        is_text = np.zeros(0, dtype=bool)
        texts = []
    out: list[str] = []
    for i in range(len(spans)):
        lo, hi = row_off[i], row_off[i + 1]
        out.append("".join(texts[j] for j in range(lo, hi) if is_text[j]))
    return batch.append_column("text", pa.array(out, pa.string()))


def assemble(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(assemble_batch, batch_format="pyarrow", zero_copy_batch=True)
