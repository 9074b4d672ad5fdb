"""A17+A18 — surface normalization + salted two-phase canonicalization.

Groups mentions by node id (= alias-linked entity id, or the
locally-computed ``c:<hash(norm_key|type)>`` — see stages/link.py),
picks the canonical form (most frequent raw surface, ties →
lexicographically smallest), merges bounded alias sets and counts.

Skew is the hard part (BASELINE.json:6 "salted-key repartitioning to
defuse head-entity skew"): head entities can own millions of mentions.
Three-phase plan, each phase shrinking data before the next shuffle:

  0. per-batch pre-aggregation inside ``map_batches`` (pure Arrow
     group_by) → at most one row per (entity, surface) per block —
     the combiner that caps shuffle volume;
  1. ``groupby([entity_id, salt])`` partial merge, where
     ``salt = hash(surface) % S`` — a head entity's rows land on S
     different reducers, each merging ≤ 1/S of its surfaces;
  2. ``groupby(entity_id)`` final merge over ≤ S·(distinct surfaces)
     pre-merged rows — provably small input.

Output ``entities``: entity_id, canonical_form, ent_type, aliases,
mention_count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import PipelineConfig
from ..functions.hashing import polars_u64

ENTITIES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_form", pa.string()),
        ("ent_type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("mention_count", pa.int64()),
    ]
)
MAX_ALIASES = 32


# Entity-id key shards: grouping phases 1-2 by the raw entity_id makes
# one map_groups Python call PER ENTITY (tens of millions of interpreter
# calls at 100 TB). Instead both reduce phases group by
# hash(entity_id) % SHARDS — one vectorized call per shard, with pure
# Arrow group_by / sort_by + numpy reduceat inside. SHARDS is dedup's
# constant (one raise-with-cluster-size knob for every sharded reducer
# in the engine, stages/dedup.py SHARDS note).
from .dedup import SHARDS


def preagg_batch(batch: pa.Table, salt: int = 8) -> pa.Table:
    """Phase 0 combiner: mentions → (entity_id, ent_type, surface,
    shard, salt, cnt) with one row per distinct surface per batch. Node
    ids already encode the normalized key (link.canonical_id hashes it),
    so the normalized string itself is NOT carried through the shuffles —
    it would widen every row for nothing."""
    t = pa.table(
        {
            "entity_id": batch.column("entity_id"),
            "ent_type": batch.column("ent_type"),
            "surface": batch.column("surface"),
        }
    )
    g = t.group_by(["entity_id", "ent_type", "surface"]).aggregate([([], "count_all")])
    salts = (polars_u64(g.column("surface").combine_chunks()) % np.uint64(max(salt, 1))).astype(np.int32)
    shards = (polars_u64(g.column("entity_id").combine_chunks()) % np.uint64(SHARDS)).astype(np.int32)
    return (
        g.rename_columns(["entity_id", "ent_type", "surface", "cnt"])
        .append_column("salt", pa.array(salts, pa.int32()))
        .append_column("shard", pa.array(shards, pa.int32()))
    )


def _merge_counts(group: pa.Table) -> pa.Table:
    """Phase 1 partial merge, one call per (shard, salt): sum cnt per
    (entity_id, surface) across every entity in the shard — pure Arrow
    group_by, no per-entity Python."""
    g = group.group_by(["entity_id", "ent_type", "surface", "shard"]).aggregate(
        [("cnt", "sum")]
    )
    return g.rename_columns(["entity_id", "ent_type", "surface", "shard", "cnt"])


def _entity_runs(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-entity runs in a table SORTED by entity_id."""
    col = tbl.column("entity_id").combine_chunks()
    codes = pc.dictionary_encode(col).indices.to_numpy(zero_copy_only=False)
    starts = np.nonzero(np.r_[True, codes[1:] != codes[:-1]])[0]
    return starts, np.r_[starts[1:], len(codes)]


def _finalize_shard(group: pa.Table) -> pa.Table:
    """Phase 2, one call per shard: one entities row per entity_id,
    fully vectorized.

    Semantics (bit-equal to the per-entity plan): canonical form = most
    frequent raw surface, ties → lexicographically smallest; aliases =
    lexicographically first MAX_ALIASES distinct surfaces;
    mention_count = total count."""
    if group.num_rows == 0:
        return pa.Table.from_pylist([], schema=ENTITIES_SCHEMA)
    g = (
        group.group_by(["entity_id", "ent_type", "surface"])
        .aggregate([("cnt", "sum")])
        .rename_columns(["entity_id", "ent_type", "surface", "cnt"])
    )
    # Canonical pick: first row of each entity run under (cnt desc,
    # surface asc); totals via reduceat over the same runs.
    s1 = g.sort_by(
        [("entity_id", "ascending"), ("cnt", "descending"), ("surface", "ascending")]
    )
    starts, _ends = _entity_runs(s1)
    cnt = s1.column("cnt").to_numpy(zero_copy_only=False)
    totals = np.add.reduceat(cnt, starts)
    take = pa.array(starts, pa.int64())
    # Aliases: per-run surface lists under (surface asc), truncated to
    # MAX_ALIASES — same runs (both sorts lead on entity_id), built as
    # one ListArray from offsets, no per-entity Python.
    s2 = g.sort_by([("entity_id", "ascending"), ("surface", "ascending")])
    starts2, ends2 = _entity_runs(s2)
    keep = np.minimum(ends2 - starts2, MAX_ALIASES)
    total_keep = int(keep.sum())
    base = np.repeat(starts2, keep)
    excl = np.repeat(np.r_[0, np.cumsum(keep)[:-1]], keep)
    take_idx = base + (np.arange(total_keep) - excl)
    alias_values = s2.column("surface").combine_chunks().take(pa.array(take_idx, pa.int64()))
    offsets = pa.array(np.r_[0, np.cumsum(keep)].astype(np.int32), pa.int32())
    aliases = pa.ListArray.from_arrays(offsets, alias_values)
    return pa.table(
        {
            "entity_id": s1.column("entity_id").take(take),
            "canonical_form": s1.column("surface").take(take),
            "ent_type": s1.column("ent_type").take(take),
            "aliases": aliases,
            "mention_count": pa.array(totals, pa.int64()),
        },
        schema=ENTITIES_SCHEMA,
    )


def canonicalize(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """mentions table (exploded, linked) → entities table."""
    cfg = cfg or PipelineConfig()
    pre = ds.map_batches(
        preagg_batch, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"salt": cfg.salt}
    )
    partial = pre.groupby(["shard", "salt"]).map_groups(_merge_counts, batch_format="pyarrow")
    return partial.groupby("shard").map_groups(_finalize_shard, batch_format="pyarrow")


def canonicalize_local(mentions: pa.Table, salt: int = 8) -> pa.Table:
    """No-Ray reference twin of :func:`canonicalize` (tests/goldens)."""
    pre = preagg_batch(mentions, salt=salt)
    merged = _merge_counts(pre)
    return _finalize_shard(merged.sort_by([("entity_id", "ascending")]))
