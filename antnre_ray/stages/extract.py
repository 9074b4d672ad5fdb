"""A15 — the stateful NER+RE extractor stage (actor pool).

``ExtractorActor`` is the composite of SURVEY.md A6–A14 as ONE batched
stage: vocab/char lookup → char-CNN → BiLSTM → CRF Viterbi → BIO span
decode → span pooling → biaffine pair scoring → triple emission, all in
one forward so the contextual states ``H`` never cross a stage boundary
(SURVEY.md A14 note). The model (the seeded reference-spec checkpoint
stand-in, functions/reference_spec.py) is loaded once per actor in
``__init__`` — the canonical map_batches actor-pool pattern.

sentences → extractions (one row per sentence, nested results):

    doc_id, part_id, sent_id, sent_start,
    mentions: list<struct<start,end,ent_type,surface,score>>,
    triples:  list<struct<subj_idx,obj_idx,pred,score>>

Nesting keeps provenance without re-running the model for mentions vs
triples; downstream stages explode cheaply (stages/explode.py).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..config import PipelineConfig
from ..functions.reference_spec import extract_sentences, get_model

MENTION_STRUCT = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("ent_type", pa.string()),
        ("surface", pa.string()),
        ("score", pa.float32()),
    ]
)
TRIPLE_STRUCT = pa.struct(
    [
        ("subj_idx", pa.int32()),
        ("obj_idx", pa.int32()),
        ("pred", pa.string()),
        ("score", pa.float32()),
    ]
)
EXTRACTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_id", pa.int32()),
        ("sent_id", pa.int32()),
        ("sent_start", pa.int32()),
        ("mentions", pa.list_(MENTION_STRUCT)),
        ("triples", pa.list_(TRIPLE_STRUCT)),
    ]
)


class ExtractorActor:
    """Stateful extractor: model weights live for the actor's lifetime."""

    def __init__(self, seed: int = 42, max_mentions: int = 10):
        self.model = get_model(seed)
        self.max_mentions = max_mentions
        # Per-token char-CNN feature cache: lives as long as the actor,
        # so head tokens are embedded once per actor, not once per batch.
        self.feat_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # Encode tokens straight from Arrow: list_flatten +
        # dictionary_encode are C kernels, so only the batch's UNIQUE
        # tokens ever become Python strings (to_pylist of the full
        # token column was ~10% of the stage's wall).
        tokens_col = batch.column("tokens")
        if isinstance(tokens_col, pa.ChunkedArray):
            tokens_col = tokens_col.combine_chunks()
        flat = tokens_col.flatten()
        denc = pc.dictionary_encode(flat)
        uniq_raw = denc.dictionary.to_pylist()
        ids_flat = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok_counts = pc.list_value_length(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sent_off = np.zeros(len(tok_counts) + 1, dtype=np.int64)
        np.cumsum(tok_counts, out=sent_off[1:])
        results = extract_sentences(
            self.model,
            None,
            self.max_mentions,
            feat_cache=self.feat_cache,
            encoded=(uniq_raw, ids_flat, tok_counts, sent_off),
        )
        # Surfaces from flat arrays: char offsets and code-point token
        # lengths index with sent_off — no per-token Python lists.
        texts = batch.column("text").to_pylist()
        offs_col = batch.column("tok_offsets")
        if isinstance(offs_col, pa.ChunkedArray):
            offs_col = offs_col.combine_chunks()
        offs_flat = offs_col.flatten().to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        mentions_col, triples_col = [], []
        for i, (text, (ments, trips)) in enumerate(zip(texts, results)):
            base = sent_off[i]
            mrows = []
            for (s, e, etype, score) in ments:
                surface = text[
                    offs_flat[base + s] : offs_flat[base + e - 1] + tok_len[base + e - 1]
                ]
                mrows.append(
                    {"start": s, "end": e, "ent_type": etype, "surface": surface, "score": score}
                )
            mentions_col.append(mrows)
            triples_col.append(
                [
                    {"subj_idx": a, "obj_idx": b, "pred": p, "score": sc}
                    for (a, b, p, sc) in trips
                ]
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "part_id": batch.column("part_id"),
                "sent_id": batch.column("sent_id"),
                "sent_start": batch.column("sent_start"),
                "mentions": pa.array(mentions_col, pa.list_(MENTION_STRUCT)),
                "triples": pa.array(triples_col, pa.list_(TRIPLE_STRUCT)),
            },
            schema=EXTRACTIONS_SCHEMA,
        )


def extract(ds: ray.data.Dataset, cfg: PipelineConfig | None = None) -> ray.data.Dataset:
    cfg = cfg or PipelineConfig()
    conc = cfg.extract_concurrency
    if isinstance(conc, tuple):
        # Raise the pool's FLOOR to a third of the live session's CPUs:
        # the default (1, N) autoscaling ramp left most cores idle for
        # the first half of the stage (measured 7.8 s → 5.6 s at 32 CPUs
        # on the sf0.1 corpus). A half-CPUs floor was measured FASTER in
        # isolation (4.2 s) but starved the co-running link/write
        # operators in the lineage wave (flagship 12.7 → 15.5 s), so a
        # third is the all-paths sweet spot. Clamped to the configured
        # ceiling so small test sessions stay safe.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        lo, hi = conc
        conc = (max(lo, min(hi, max(1, cpus // 3 - 1))), hi)
    kwargs = dict(
        fn_constructor_kwargs={"seed": cfg.seed, "max_mentions": cfg.max_mentions_per_sentence},
        batch_size=cfg.extract_batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=conc,
        num_cpus=1,
    )
    # GPU actor pool (cfg.extract_num_gpus > 0): each actor reserves a
    # GPU share and Ray places the pool on GPU nodes; 0 keeps the pure
    # CPU pool (this sandbox). Passing num_gpus=0 explicitly would still
    # flip Ray's placement heuristics, so only set it when requested.
    if cfg.extract_num_gpus:
        kwargs["num_gpus"] = cfg.extract_num_gpus
    return ds.map_batches(ExtractorActor, **kwargs)
