"""A4+A5 — sentence splitting + tokenization (1→N flat-map shape).

documents(+text) → sentences table:

    doc_id: string, part_id: int32, sent_id: int32, sent_start: int32,
    text: string, tokens: list<string>, tok_offsets: list<int32>

``sent_start`` is the char offset of the sentence in the assembled doc
text and ``tok_offsets`` are char offsets within the sentence, so any
mention can be traced back to its source span (SURVEY.md §1.3). The
documents' ``spans`` column deliberately does NOT flow past this point —
sentences carry only ids (wide-row rule, SURVEY.md §7.4.4).

Stateless map_batches whose output has more rows than its input — the
batch UDF simply returns a bigger table (Ray Data's flat-map shape).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.tokenize import split_sentences, tokenize

SENTENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_id", pa.int32()),
        ("sent_id", pa.int32()),
        ("sent_start", pa.int32()),
        ("text", pa.string()),
        ("tokens", pa.list_(pa.string())),
        ("tok_offsets", pa.list_(pa.int32())),
    ]
)


def sentencize_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    part_ids = (
        batch.column("part_id").to_pylist()
        if "part_id" in batch.column_names
        else [0] * len(doc_ids)
    )
    texts = batch.column("text").to_pylist()
    o_doc, o_part, o_sid, o_start, o_text, o_toks, o_offs = [], [], [], [], [], [], []
    for doc_id, part_id, text in zip(doc_ids, part_ids, texts):
        if not text:
            continue
        for sid, (start, sent) in enumerate(split_sentences(text)):
            toks, offs = tokenize(sent)
            if not toks:
                continue
            o_doc.append(doc_id)
            o_part.append(part_id)
            o_sid.append(sid)
            o_start.append(start)
            o_text.append(sent)
            o_toks.append(toks)
            o_offs.append(offs)
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "part_id": pa.array(o_part, pa.int32()),
            "sent_id": pa.array(o_sid, pa.int32()),
            "sent_start": pa.array(o_start, pa.int32()),
            "text": pa.array(o_text, pa.string()),
            "tokens": pa.array(o_toks, pa.list_(pa.string())),
            "tok_offsets": pa.array(o_offs, pa.list_(pa.int32())),
        },
        schema=SENTENCES_SCHEMA,
    )


def sentencize(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(sentencize_batch, batch_format="pyarrow", zero_copy_batch=True)
