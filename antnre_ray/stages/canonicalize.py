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


def preagg_batch(batch: pa.Table, salt: int = 8) -> pa.Table:
    """Phase 0 combiner: mentions → (entity_id, ent_type, surface,
    salt, cnt) with one row per distinct surface per batch. Node ids
    already encode the normalized key (link.canonical_id hashes it), so
    the normalized string itself is NOT carried through the shuffles —
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
    return g.rename_columns(["entity_id", "ent_type", "surface", "cnt"]).append_column(
        "salt", pa.array(salts, pa.int32())
    )


def _merge_counts(group: pa.Table) -> pa.Table:
    """Phase 1 partial merge: sum cnt per (entity_id, surface)."""
    g = group.group_by(["entity_id", "ent_type", "surface", "salt"]).aggregate(
        [("cnt", "sum")]
    )
    return g.rename_columns(["entity_id", "ent_type", "surface", "salt", "cnt"])


def _finalize(group: pa.Table) -> pa.Table:
    """Phase 2: one entities row per entity_id group."""
    surfaces = group.column("surface").to_pylist()
    counts = group.column("cnt").to_pylist()
    totals: dict[str, int] = {}
    for s, c in zip(surfaces, counts):
        totals[s] = totals.get(s, 0) + int(c)
    # Most frequent raw surface; ties → lexicographically smallest.
    canonical = min(totals.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    aliases = sorted(totals)[:MAX_ALIASES]
    return pa.table(
        {
            "entity_id": pa.array([group.column("entity_id")[0].as_py()], pa.string()),
            "canonical_form": pa.array([canonical], pa.string()),
            "ent_type": pa.array([group.column("ent_type")[0].as_py()], pa.string()),
            "aliases": pa.array([aliases], pa.list_(pa.string())),
            "mention_count": pa.array([sum(totals.values())], pa.int64()),
        },
        schema=ENTITIES_SCHEMA,
    )


def canonicalize(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    """mentions table (exploded, linked) → entities table."""
    cfg = cfg or PipelineConfig()
    pre = ds.map_batches(
        preagg_batch, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"salt": cfg.salt}
    )
    partial = pre.groupby(["entity_id", "salt"]).map_groups(_merge_counts, batch_format="pyarrow")
    return partial.groupby("entity_id").map_groups(_finalize, batch_format="pyarrow")


def canonicalize_local(mentions: pa.Table, salt: int = 8) -> pa.Table:
    """No-Ray reference twin of :func:`canonicalize` (tests/goldens)."""
    pre = preagg_batch(mentions, salt=salt)
    out: list[pa.Table] = []
    for eid in sorted(set(pre.column("entity_id").to_pylist())):
        grp = pre.filter(pc.equal(pre.column("entity_id"), eid))
        out.append(_finalize(_merge_counts(grp)))
    return pa.concat_tables(out) if out else pa.Table.from_pylist([], schema=ENTITIES_SCHEMA)
