"""Interleaved-document corpus: schema, synthesis, derivation (FIXTURES.md F1/F2).

The engine's canonical input is the driver-pinned shape
(BASELINE.json:15 input_hint):

    doc_id : string
    spans  : list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Two producers of that shape live here, both bit-deterministic (every
row a pure function of ``doc_id``/seed via cross-run-stable hashes):

- :func:`synthesize_documents` — pure-synthetic fixture corpus over the
  closed reference-spec vocabulary, with gold annotations known by
  construction (F2) and the edge rows F1 mandates (empty doc,
  media-only doc, giant span, unicode).
- :func:`derive_interleaved` — derives an interleaved corpus from the
  driver's ``documents.parquet`` (doc_id:int64, text, …): splits the
  source text into chunks, interleaves planted template sentences (so
  extraction has signal at bench scale) and media spans. Runs as a
  stateless ``map_batches`` over the pruned 2-column read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import stable_u64
from ..functions.reference_spec import SURFACES, TEMPLATES

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)
DOCUMENTS_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("spans", pa.list_(SPAN_STRUCT))]
)

# TEMPLATES entries are ("{s} … {o} .", subj_type, obj_type, pred, trigger);
# pre-split token parts so gold token spans are known without re-tokenizing.
_TEMPLATE_PARTS = []
for _tmpl, _st, _ot, _pred, _trig in TEMPLATES:
    _pre, _rest = _tmpl.split("{s}")
    _mid, _post = _rest.split("{o}")
    _TEMPLATE_PARTS.append(
        (_pre.split(), _mid.split(), _post.split(), _st, _ot, _pred)
    )

# The filler inventory is the MODEL's closed-vocabulary filler list —
# import it so the corpus can never drift out of the model vocabulary.
from ..functions.reference_spec import FILLERS as _FILLERS  # noqa: E402


def plant_sentence(u: int) -> tuple[str, list[tuple[int, int, str]], tuple[int, int, str]]:
    """Deterministically instantiate a relation template from a u64 draw.

    Returns ``(sentence_text, gold_entities, gold_relation)`` with
    half-open token spans; gold_relation indexes into gold_entities.
    """
    pre, mid, post, st, ot, pred = _TEMPLATE_PARTS[u % len(_TEMPLATE_PARTS)]
    subs = SURFACES[st]
    obs = SURFACES[ot]
    s_i = (u >> 8) % len(subs)
    o_i = (u >> 16) % len(obs)
    if st == ot and s_i == o_i:
        o_i = (o_i + 1) % len(obs)
    s_toks = subs[s_i].split()
    o_toks = obs[o_i].split()
    toks = pre + s_toks + mid + o_toks + post
    s_start = len(pre)
    s_end = s_start + len(s_toks)
    o_start = s_end + len(mid)
    o_end = o_start + len(o_toks)
    ents = [(s_start, s_end, st), (o_start, o_end, ot)]
    return " ".join(toks), ents, (0, 1, pred)


def _spans_table(doc_ids: list[str], flat: dict, offsets: list[int]) -> pa.Table:
    """Assemble the list<struct> spans column from flat builders."""
    struct = pa.StructArray.from_arrays(
        [
            pa.array(flat["kind"], pa.string()),
            pa.array(flat["text"], pa.string()),
            pa.array(flat["media_ref"], pa.string()),
            pa.array(flat["offset"], pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.Table.from_arrays([pa.array(doc_ids, pa.string()), spans], schema=DOCUMENTS_SCHEMA)


def _append_span(flat: dict, kind: str, text: str, media_ref: str, offset: int) -> int:
    flat["kind"].append(kind)
    flat["text"].append(text)
    flat["media_ref"].append(media_ref)
    flat["offset"].append(offset)
    return offset + (len(text) if kind == "text" else 1)


def synthesize_documents(n_docs: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Pure-synthetic corpus + gold annotations (FIXTURES.md F1 tiny/small).

    Gold schema (F2): doc_id, sent_id(=planted sentence ordinal),
    tokens, entities list<struct<start,end,ent_type>>,
    relations list<struct<subj_idx,obj_idx,pred>>.
    """
    doc_ids: list[str] = []
    flat = {"kind": [], "text": [], "media_ref": [], "offset": []}
    offsets = [0]
    g_doc, g_sent, g_toks, g_ents, g_rels = [], [], [], [], []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        doc_ids.append(doc_id)
        u = stable_u64(f"{seed}|doc|{doc_id}")
        mode = u % 101
        if mode == 0 and i > 0:  # empty-spans edge doc
            offsets.append(len(flat["kind"]))
            continue
        off = 0
        if mode == 1 and i > 0:  # media-only edge doc
            off = _append_span(flat, "image", "", f"media://img/{i}_0", off)
            off = _append_span(flat, "audio", "", f"media://aud/{i}_1", off)
            offsets.append(len(flat["kind"]))
            continue
        n_sent = 2 + u % 5
        sent_ordinal = 0
        for k in range(n_sent):
            v = stable_u64(f"{seed}|sent|{doc_id}|{k}")
            if v % 3 == 0:  # filler sentence
                text = _FILLERS[v % len(_FILLERS)]
            else:  # planted relation sentence with known gold
                text, ents, rel = plant_sentence(v)
                g_doc.append(doc_id)
                g_sent.append(sent_ordinal)
                g_toks.append(text.split())
                g_ents.append([{"start": s, "end": e, "ent_type": t} for s, e, t in ents])
                g_rels.append([{"subj_idx": rel[0], "obj_idx": rel[1], "pred": rel[2]}])
            if mode == 2 and k == 0:  # unicode edge doc (NFKC-normalizable)
                text = text.replace("a", "ａ", 1)  # fullwidth a
            off = _append_span(flat, "text", text + " ", "", off)
            sent_ordinal += 1
            if v % 10 < 3:  # interleave a media span
                kind = "image" if v % 2 == 0 else "audio"
                off = _append_span(flat, kind, "", f"media://{kind[:3]}/{i}_{k}", off)
        if mode == 3:  # giant single text span (≥10 kchars)
            off = _append_span(flat, "text", ("lorem ipsum dolor sit amet . " * 400), "", off)
        offsets.append(len(flat["kind"]))
    docs = _spans_table(doc_ids, flat, offsets)
    gold = pa.table(
        {
            "doc_id": pa.array(g_doc, pa.string()),
            "sent_id": pa.array(g_sent, pa.int32()),
            "tokens": pa.array(g_toks, pa.list_(pa.string())),
            "entities": pa.array(
                g_ents,
                pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32()), ("ent_type", pa.string())])),
            ),
            "relations": pa.array(
                g_rels,
                pa.list_(pa.struct([("subj_idx", pa.int32()), ("obj_idx", pa.int32()), ("pred", pa.string())])),
            ),
        }
    )
    return docs, gold


def derive_batch(batch: pa.Table, seed: int = 42, repeat_tag: str = "") -> pa.Table:
    """Derive interleaved documents from driver documents rows (F1 rule).

    Pure function of (doc_id, text, seed): chunk the source text at
    sentence boundaries into ≤3 text spans, interleave 1–3 planted
    template sentences and media spans, with the F1 edge rows at fixed
    hash residues. ``repeat_tag`` suffixes doc_id for bench replication.
    """
    from ..functions.tokenize import split_sentences

    src_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids: list[str] = []
    flat = {"kind": [], "text": [], "media_ref": [], "offset": []}
    offsets = [0]
    for rid, text in zip(src_ids, texts):
        doc_id = f"doc-{rid:08d}{repeat_tag}"
        doc_ids.append(doc_id)
        u = stable_u64(f"{seed}|derive|{doc_id}")
        mode = u % 101
        if mode == 0:
            offsets.append(len(flat["kind"]))
            continue
        off = 0
        if mode == 1:
            off = _append_span(flat, "image", "", f"media://img/{doc_id}_0", off)
            offsets.append(len(flat["kind"]))
            continue
        sents = [s for _, s in split_sentences(text or "")]
        n_chunks = max(1, min(3, 1 + u % 3))
        chunk_size = max(1, (len(sents) + n_chunks - 1) // n_chunks) if sents else 1
        chunks = [" ".join(sents[i : i + chunk_size]) for i in range(0, len(sents), chunk_size)] or [""]
        n_plant = 1 + (u >> 32) % 3
        planted = [plant_sentence(stable_u64(f"{seed}|plant|{doc_id}|{k}"))[0] for k in range(n_plant)]
        media_k = 0
        for ci, chunk in enumerate(chunks):
            if chunk:
                off = _append_span(flat, "text", chunk + " ", "", off)
            if ci < len(planted):
                off = _append_span(flat, "text", planted[ci] + " ", "", off)
            mdraw = stable_u64(f"{seed}|media|{doc_id}|{ci}")
            if mdraw % 10 < 3:
                # Kind from the hash draw (not a per-doc counter): most
                # driver docs derive a single chunk, so a counter would
                # only ever emit the first kind.
                kind = ("image", "audio", "video")[(mdraw >> 8) % 3]
                off = _append_span(flat, kind, "", f"media://{kind[:3]}/{doc_id}_{media_k}", off)
                media_k += 1
        for k in range(len(chunks), n_plant):  # leftover planted sentences
            off = _append_span(flat, "text", planted[k] + " ", "", off)
        offsets.append(len(flat["kind"]))
    return _spans_table(doc_ids, flat, offsets)


def derived_doc_ids(
    documents_parquet: str, repeat: int = 1, partitions: int = 8
) -> "pa.Table":
    """(doc_id, part_id) of the derived corpus WITHOUT deriving it.

    The F1 derivation rule names rows purely from the source doc_id
    (``doc-%08d[#rR]``), so lineage fingerprints can come from a
    doc_id-column-only read — pruning the fingerprint pass from a full
    corpus derivation to a metadata-sized scan (SURVEY.md: prune at the
    read). Must stay in lockstep with :func:`derive_batch` naming.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import stable_u64_array

    src = pq.read_table(documents_parquet, columns=["doc_id"]).column("doc_id").to_pylist()
    ids: list[str] = []
    for r in range(repeat):
        tag = f"#r{r}" if repeat > 1 else ""
        ids.extend(f"doc-{rid:08d}{tag}" for rid in src)
    part = (stable_u64_array(ids) % np.uint64(max(partitions, 1))).astype("int32")
    return pa.table({"doc_id": pa.array(ids, pa.string()), "part_id": pa.array(part, pa.int32())})


def derived_gold_batch(batch: pa.Table, seed: int = 42, repeat: int = 1) -> pa.Table:
    """Gold triples planted by :func:`derive_batch`, for ONE batch of
    driver document rows (doc_id column only) — the distributed form of
    :func:`derived_gold_triples`, runnable as a stateless map_batches
    over the pruned 1-column read."""
    src = batch.column("doc_id").to_pylist()
    o_doc, o_s, o_p, o_o = [], [], [], []
    for r in range(repeat):
        tag = f"#r{r}" if repeat > 1 else ""
        for rid in src:
            doc_id = f"doc-{rid:08d}{tag}"
            u = stable_u64(f"{seed}|derive|{doc_id}")
            if u % 101 in (0, 1):  # empty / media-only doc: nothing planted
                continue
            n_plant = 1 + (u >> 32) % 3
            for k in range(n_plant):
                text, ents, (si, oi, pred) = plant_sentence(stable_u64(f"{seed}|plant|{doc_id}|{k}"))
                toks = text.split()
                s_s, s_e, _ = ents[si]
                o_s_, o_e, _ = ents[oi]
                o_doc.append(doc_id)
                o_s.append(" ".join(toks[s_s:s_e]))
                o_p.append(pred)
                o_o.append(" ".join(toks[o_s_:o_e]))
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "subj_surface": pa.array(o_s, pa.string()),
            "pred": pa.array(o_p, pa.string()),
            "obj_surface": pa.array(o_o, pa.string()),
        }
    )


def derived_gold_triples(
    documents_parquet: str, seed: int = 42, repeat: int = 1
) -> pa.Table:
    """Surface-level gold triples planted by :func:`derive_batch`.

    Mirrors the deriver's planting decisions exactly (same hash draws),
    returning (doc_id, subj_surface, pred, obj_surface) — the ground
    truth for corpus-scale P/R evaluation (A20). Surface-level keys are
    used because planted sentences may merge with unpunctuated source
    chunks, shifting token offsets but never surfaces.
    """
    import pyarrow.parquet as pq

    src = pq.read_table(documents_parquet, columns=["doc_id"])
    return derived_gold_batch(src, seed=seed, repeat=repeat)


def derived_gold_dataset(
    documents_parquet: str, seed: int = 42, repeat: int = 1
) -> ray.data.Dataset:
    """Distributed gold derivation: pruned 1-column read → map_batches."""
    base = ray.data.read_parquet(documents_parquet, columns=["doc_id"])
    return base.map_batches(
        derived_gold_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"seed": seed, "repeat": repeat},
    )


def _derive_repeat_batch(batch: pa.Table, seed: int, repeat: int) -> pa.Table:
    """Derive all ``repeat`` replicas of a batch in one UDF call.

    A repeat-wide ``union`` of map branches anti-scaled badly (a 16-way
    union re-plans the shared read per branch and floods the scheduler);
    one flat-map producing R× rows keeps the plan a straight line.
    """
    if repeat <= 1:
        return derive_batch(batch, seed=seed)
    outs = [
        derive_batch(batch, seed=seed, repeat_tag=f"#r{r}") for r in range(repeat)
    ]
    return pa.concat_tables(outs)


def derive_interleaved(
    documents_parquet: str, seed: int = 42, repeat: int = 1, **read_kwargs
) -> ray.data.Dataset:
    """Driver documents.parquet → interleaved-document Dataset (pruned read).

    ``repeat > 1`` emits R derived copies with distinct doc_id suffixes
    (bench corpus replication, BASELINE.md protocol) from a single
    flat-map — no union fan-in.
    """
    base = ray.data.read_parquet(documents_parquet, columns=["doc_id", "text"], **read_kwargs)
    return base.map_batches(
        _derive_repeat_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        fn_kwargs={"seed": seed, "repeat": repeat},
    )


# ------------------------------------------------- varied stress corpus
# BASELINE.md stress-diversity protocol (VERDICT r4 "Next round" #1):
# the driver's documents.parquet draws its text from a 31-word
# vocabulary, so the ×64-replicated stress corpus flatters the
# extractor's per-actor token cache (every source token is warm after
# the first batch). This generator emits the SAME driver shape
# (doc_id:int64, text, lang, source, n_chars) at any row count with
# realistic word-type diversity: `vocab_size` pseudo-word types drawn
# zipfian (s = 1.07, the empirical English exponent), each word a
# deterministic syllable expansion of its frequency rank. Every row is
# a pure function of (doc_id, seed) via splitmix64 draws, so the corpus
# is identical across batch splits, partition layouts and cluster sizes.

_SYLLABLES = [c + v for c in "btkmsrldnpgfhzvwcjqx" for v in "aeiou"][:64]
_ZIPF_S = 1.07
_varied_state: dict = {}  # (vocab_size,) -> (word ndarray, cdf ndarray)


def _varied_vocab(vocab_size: int) -> tuple[np.ndarray, np.ndarray]:
    """(words, zipf CDF) for a vocabulary size — built once per process.

    Words are unique syllable expansions of their rank (base-64 digits →
    CV syllables, so rank 0 is 2 chars and rank 99 999 is 6), SKIPPING
    any string in the model's closed vocabulary (e.g. rank li·ma would
    collide with the LOC surface "lima" and plant phantom entities in
    what must be plain background text)."""
    if vocab_size in _varied_state:
        return _varied_state[vocab_size]
    from ..functions.reference_spec import _build_vocab

    reserved = set(_build_vocab())
    words: list[str] = []
    rank = 0
    while len(words) < vocab_size:
        r, parts = rank, []
        while True:
            parts.append(_SYLLABLES[r % 64])
            r //= 64
            if r == 0:
                break
        w = "".join(reversed(parts))
        if w not in reserved:
            words.append(w)
        rank += 1
    cdf = np.cumsum(1.0 / np.arange(1, vocab_size + 1) ** _ZIPF_S)
    cdf /= cdf[-1]
    out = (np.asarray(words, dtype=object), cdf)
    _varied_state[vocab_size] = out
    return out


def varied_documents_batch(
    batch: pa.Table, seed: int = 43, vocab_size: int = 100_000
) -> pa.Table:
    """One batch of driver-shaped document rows from int64 ids.

    Vectorized: one splitmix64 draw per (doc, word ordinal) → zipf rank
    via searchsorted on the precomputed CDF → numpy fancy-index into the
    word inventory; only the final per-doc " ".join is Python."""
    from ..functions.hashing import mix64

    words, cdf = _varied_vocab(vocab_size)
    ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    h = mix64(ids, seed=seed)
    n_words = (np.uint64(20) + h % np.uint64(61)).astype(np.int64)  # 20–80, mean ≈ 50
    starts = np.cumsum(n_words) - n_words
    doc_idx = np.repeat(np.arange(len(ids)), n_words)
    k = np.arange(int(n_words.sum()), dtype=np.uint64) - np.repeat(starts, n_words).astype(np.uint64)
    with np.errstate(over="ignore"):
        u = mix64(h[doc_idx] + k * np.uint64(0x9E3779B97F4A7C15), seed=seed + 1)
    ranks = np.searchsorted(cdf, u.astype(np.float64) / 2.0**64, side="right")
    toks = words[np.minimum(ranks, vocab_size - 1)]
    texts = [" ".join(toks[s : s + n]) for s, n in zip(starts, n_words)]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["varied"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def synthesize_varied_documents(
    n_docs: int, seed: int = 43, vocab_size: int = 100_000, blocks: int | None = None
) -> ray.data.Dataset:
    """Distributed varied-corpus synthesis: range → map_batches."""
    base = ray.data.range(n_docs, override_num_blocks=blocks) if blocks else ray.data.range(n_docs)
    return base.map_batches(
        varied_documents_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
        fn_kwargs={"seed": seed, "vocab_size": vocab_size},
    )
