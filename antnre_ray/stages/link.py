"""A16 — entity linking: actor-held alias dictionary + embedding kNN.

Per mention: exact lookup of the NORMALIZED surface in an alias
dictionary (type-checked); on miss, cosine nearest-neighbor of the
surface's char-n-gram embedding against the entity embedding matrix,
accepted above a threshold (BASELINE.json:6 "actor-held alias
dictionary + embedding nearest-neighbor scoring").

Mentions that neither path links get a locally-computable canonical id
``c:<hash(norm_key|type)>`` — the same id A18's canonicalization
assigns — so downstream graph materialization needs NO join against the
entities table: every batch resolves its own node ids. That removes an
all-to-all shuffle from the hot path at 100 TB (SURVEY.md §2A A16/A18).

Broadcast pattern: the linker state (alias dict + embedding matrix) is
built once on the driver, ``ray.put`` once, and each actor ``ray.get``s
the ref in ``__init__`` (zero-copy shared-memory read per node) — never
re-shipped per batch. Plain objects are also accepted so the no-Ray
reference path and unit tests work without a cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import PipelineConfig
from ..functions.embed import embed_strings
from ..functions.hashing import stable_hex
from ..functions.normalize import normalize_surfaces
from ..functions.reference_spec import SURFACES

LINKED_MENTION_STRUCT = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("ent_type", pa.string()),
        ("surface", pa.string()),
        ("score", pa.float32()),
        ("entity_id", pa.string()),
        ("link_score", pa.float32()),
    ]
)


@dataclass
class LinkerState:
    """Alias dict + entity embedding index (FIXTURES.md F3)."""

    alias: dict[str, tuple[str, str, float]]  # norm_alias -> (entity_id, ent_type, prior)
    entity_ids: list[str]
    entity_types: list[str]
    emb: np.ndarray  # [E, dim] unit rows


def canonical_id(norm_key: str, ent_type: str) -> str:
    """The join-free fallback node id; A18 assigns the identical id."""
    return "c:" + stable_hex(f"{norm_key}|{ent_type}")


def build_linker_state() -> LinkerState:
    """Deterministic KB from the reference-spec surface inventory: one
    entity per (type, surface).

    Alias keys AND entity embeddings are built from the NORMALIZED form:
    normalization itself is what makes case/punctuation variants hit
    (one key per surface — enumerating variants that all normalize to
    the same string would be dead work), and embedding the normalized
    form guarantees an exact re-surfaced mention scores cosine 1.0
    regardless of the KB surface's original casing/punctuation (queries
    embed normalized strings in ``_link_one``)."""
    alias: dict[str, tuple[str, str, float]] = {}
    ids: list[str] = []
    types: list[str] = []
    forms: list[str] = []
    for etype, surfaces in SURFACES.items():
        for s in surfaces:
            eid = "e:" + stable_hex(f"{etype}|{s}")
            norm = _norm_one(s)
            ids.append(eid)
            types.append(etype)
            forms.append(norm)
            alias.setdefault(norm, (eid, etype, 1.0))
    return LinkerState(alias=alias, entity_ids=ids, entity_types=types, emb=embed_strings(forms))


def _norm_one(s: str) -> str:
    return normalize_surfaces(pa.array([s]))[0].as_py()


class LinkerActor:
    """Stateful linker: KB loaded once per actor; per-surface result cache
    (head surfaces dominate real corpora, so the hit rate is high)."""

    def __init__(self, state, threshold: float = 0.85):
        if isinstance(state, ray.ObjectRef):
            state = ray.get(state)
        self.state: LinkerState = state
        self.threshold = threshold
        self._cache: dict[tuple[str, str], tuple[str, float]] = {}
        # Per-type candidate index: the kNN must rank WITHIN the
        # mention's type — a global argmax would let a wrong-type top-1
        # veto linking even when a same-type entity clears the threshold.
        idx: dict[str, list[int]] = {}
        for i, t in enumerate(state.entity_types):
            idx.setdefault(t, []).append(i)
        self._type_idx = {t: np.asarray(v, dtype=np.int64) for t, v in idx.items()}

    def _link_one(self, norm: str, etype: str) -> tuple[str, float]:
        """Single-mention reference path (tests); batches go through the
        vectorized ``_link_unique`` instead."""
        out = self._link_unique([norm], [etype])
        return out[0]

    def _link_unique(self, norms: list[str], types: list[str]) -> list[tuple[str, float]]:
        """Link UNIQUE (norm, etype) pairs: memo-cache and alias-dict
        hits resolve per unique key (cheap — unique count ≪ mention
        count on head-heavy corpora), and all remaining misses of a type
        score in ONE [misses, dim] × [dim, candidates] matmul instead of
        a gemv per mention (VERDICT r2 item #4)."""
        st = self.state
        out: list = [None] * len(norms)
        miss_by_type: dict[str, list[int]] = {}
        for j, (norm, etype) in enumerate(zip(norms, types)):
            hit = self._cache.get((norm, etype))
            if hit is not None:
                out[j] = hit
                continue
            a = st.alias.get(norm)
            if a is not None and a[1] == etype:
                out[j] = (a[0], float(a[2]))
            else:
                miss_by_type.setdefault(etype, []).append(j)
        for etype, idxs in miss_by_type.items():
            cand = self._type_idx.get(etype)
            if cand is None or not len(cand):
                for j in idxs:
                    out[j] = (canonical_id(norms[j], etype), 0.0)
                continue
            Q = embed_strings([norms[j] for j in idxs])
            sims = Q @ st.emb[cand].T  # [misses, candidates]
            best = np.argmax(sims, axis=1)
            best_sim = sims[np.arange(len(idxs)), best]
            for j, b, s in zip(idxs, best, best_sim):
                if float(s) >= self.threshold:
                    out[j] = (st.entity_ids[int(cand[int(b)])], float(s))
                else:
                    out[j] = (canonical_id(norms[j], etype), 0.0)
        if len(self._cache) < 200_000:
            for j, (norm, etype) in enumerate(zip(norms, types)):
                self._cache[(norm, etype)] = out[j]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ments = batch.column("mentions")
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        flat = ments.flatten()
        surfaces = flat.field("surface")
        types_arr = flat.field("ent_type")
        norms_arr = normalize_surfaces(surfaces)
        # Dedupe (norm, etype) before linking: head surfaces dominate, so
        # the linker runs once per DISTINCT key per batch, then results
        # scatter back by inverse index.
        import pyarrow.compute as pc

        combined = pc.binary_join_element_wise(norms_arr, types_arr, "\x1f")
        comb = combined.combine_chunks() if isinstance(combined, pa.ChunkedArray) else combined
        if comb.null_count == 0:
            # C-native dedup: dictionary codes are the inverse mapping;
            # first occurrence per code via a running minimum.
            enc = comb.dictionary_encode()
            inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            first = np.full(len(enc.dictionary), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(first, inv, np.arange(len(inv)))
        else:
            # Null surface/ent_type keys: fall back to a dict dedup (the
            # None-tolerant path np.unique/dictionary codes can't give).
            keys = comb.to_pylist()
            seen: dict = {}
            inv = np.empty(len(keys), dtype=np.int64)
            first_list: list[int] = []
            for i, k in enumerate(keys):
                j = seen.get(k)
                if j is None:
                    j = len(first_list)
                    seen[k] = j
                    first_list.append(i)
                inv[i] = j
            first = np.asarray(first_list, dtype=np.int64)
        norms_all = norms_arr.to_pylist()
        types_all = types_arr.to_pylist()
        resolved = self._link_unique(
            [norms_all[i] for i in first], [types_all[i] for i in first]
        )
        eids = [resolved[j][0] for j in inv]
        scores = [resolved[j][1] for j in inv]
        linked_flat = pa.StructArray.from_arrays(
            [
                flat.field("start"),
                flat.field("end"),
                flat.field("ent_type"),
                flat.field("surface"),
                flat.field("score"),
                pa.array(eids, pa.string()),
                pa.array(scores, pa.float32()),
            ],
            fields=list(LINKED_MENTION_STRUCT),
        )
        linked = pa.ListArray.from_arrays(ments.offsets, linked_flat)
        idx = batch.schema.get_field_index("mentions")
        return batch.set_column(idx, "mentions", linked)


def link(
    ds: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    state_ref=None,
) -> ray.data.Dataset:
    """extractions → extractions with linked mentions (actor pool).

    ``state_ref`` should be a ``ray.put`` ObjectRef of a LinkerState so
    the KB ships once into the object store, not once per task.
    """
    cfg = cfg or PipelineConfig()
    if state_ref is None:
        state_ref = ray.put(build_linker_state())
    return ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"state": state_ref, "threshold": cfg.link_threshold},
        batch_size=cfg.link_batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=cfg.link_concurrency,
        num_cpus=1,
    )
