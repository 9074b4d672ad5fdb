"""Sequence packing: assign documents to fixed-token-budget bins
(context windows) for LLM training — the step between dedup/mixing and
batch assembly in a training-data pipeline.

Scale shape: token counting is a vectorized map-only pass; packing
itself shards on doc_id % shards and packs each shard INDEPENDENTLY
(bins never cross shards), so the op is one shuffle of (doc_id,
n_tokens) pairs — the text never moves — and one packing call per
shard. Unlike the per-key reducers (dedup SHARDS=251), the shard count
here is a PARALLELISM dial, not a key-cardinality one: more shards =
more parallel packers but lower fill (each shard packs blind to the
others' bins), so it should track cluster size, and each shard must
hold enough docs to pack densely. Per-shard best-fit-decreasing is an intrinsically sequential
in-memory loop (like language-ID's per-doc scalar pass), but it only
ever sees |docs| / SHARDS ids, not payloads. The cost of shard-local
bins is a slightly lower global fill factor; the gain is zero global
coordination, which is what survives a 256-node cluster.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

def _count_tokens(batch: pa.Table, shards: int) -> pa.Table:
    """Whitespace token count, pure-Arrow (the quality_stats kernel)."""
    text = batch.column("text")
    trimmed = pc.replace_substring_regex(text, pattern=r"^\s+|\s+$", replacement="")
    n = pc.add(
        pc.cast(pc.count_substring_regex(trimmed, r"\s+"), pa.int64()),
        pa.scalar(1, pa.int64()),
    )
    n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int64()), n)
    did = batch.column("doc_id")
    did_np = pc.cast(did, pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "shard": pa.array((did_np % shards).astype(np.int32), pa.int32()),
            "doc_id": did,
            "n_tokens": n,
        }
    )


def _pack_shard(group: pa.Table, budget: int) -> pa.Table:
    """Best-fit-decreasing over one shard's (doc_id, n_tokens) rows.

    Bin ids are globally unique and deterministic: shard * 2^32 + local
    index. Docs larger than the budget get a dedicated bin with
    truncated=True (the downstream tokenizer decides split vs drop)."""
    did = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    tok = group.column("n_tokens").combine_chunks().to_numpy(zero_copy_only=False)
    shard = int(group.column("shard")[0].as_py()) if group.num_rows else 0
    order = np.lexsort((did, -tok))
    did, tok = did[order], tok[order]

    # best-fit-decreasing with a sorted free-space list: O(n log n).
    # rem holds (free_space, bin_local_id) sorted by free_space; bisect
    # finds the tightest bin that still fits.
    rem: list[tuple[int, int]] = []
    bin_of = np.empty(len(did), dtype=np.int64)
    truncated = np.zeros(len(did), dtype=bool)
    next_bin = 0
    for i, t in enumerate(tok):
        t = int(t)
        if t >= budget:
            bin_of[i] = next_bin
            truncated[i] = t > budget
            next_bin += 1
            continue
        j = bisect_left(rem, (t,))
        if j < len(rem):
            free, b = rem.pop(j)
            bin_of[i] = b
            insort(rem, (free - t, b))
        else:
            bin_of[i] = next_bin
            insort(rem, (budget - t, next_bin))
            next_bin += 1
    base = np.int64(shard) << np.int64(32)
    return pa.table(
        {
            "doc_id": pa.array(did, pa.int64()),
            "bin_id": pa.array(base + bin_of, pa.int64()),
            "n_tokens": pa.array(tok, pa.int64()),
            "truncated": pa.array(truncated),
        }
    )


def pack_sequences(
    ds: ray.data.Dataset, budget: int = 512, shards: int = 64
) -> ray.data.Dataset:
    """(doc_id, text) → (doc_id, bin_id, n_tokens, truncated): each doc
    assigned to exactly one token-budget bin."""

    def count(batch: pa.Table) -> pa.Table:
        return _count_tokens(batch, shards)

    def pack(group: pa.Table) -> pa.Table:
        return _pack_shard(group, budget)

    return (
        ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )
