"""Varied stress corpus (BASELINE.md stress-diversity protocol).

The generator must be a pure function of (doc_id, seed) — identical
output across batch splits — emit the driver documents schema, and
actually deliver word-type diversity (the whole point: the ×64
replicated stress corpus has 31 source word types; this one has tens
of thousands, so the extractor's token cache pays realistic misses).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from antnre_ray.sources.corpus import varied_documents_batch


def _ids(lo: int, hi: int) -> pa.Table:
    return pa.table({"id": pa.array(range(lo, hi), pa.int64())})


def test_batch_split_invariance():
    whole = varied_documents_batch(_ids(0, 200))
    parts = pa.concat_tables(
        [varied_documents_batch(_ids(0, 63)), varied_documents_batch(_ids(63, 200))]
    )
    assert whole.equals(parts)


def test_driver_schema_and_diversity():
    t = varied_documents_batch(_ids(0, 2000))
    assert t.column_names == ["doc_id", "text", "lang", "source", "n_chars"]
    assert t.schema.field("doc_id").type == pa.int64()
    toks: set[str] = set()
    total = 0
    for s in t.column("text").to_pylist():
        w = s.split()
        total += len(w)
        toks.update(w)
    # zipf over 100k types: a 2k-doc sample (~100k tokens) must show
    # orders of magnitude more diversity than the 31-type driver corpus
    assert len(toks) > 10_000, len(toks)
    assert 20 <= total / t.num_rows <= 80  # words per doc in the drawn band


def test_no_model_vocab_collisions():
    """Background text must never contain closed-vocabulary words —
    a collision (e.g. the syllable word 'lima' vs the LOC surface)
    would plant phantom entities in what must be noise text."""
    from antnre_ray.functions.reference_spec import _build_vocab

    reserved = set(_build_vocab())
    t = varied_documents_batch(_ids(0, 3000))
    toks: set[str] = set()
    for s in t.column("text").to_pylist():
        toks.update(s.split())
    assert not (toks & reserved)


def test_seed_changes_corpus():
    a = varied_documents_batch(_ids(0, 50), seed=43)
    b = varied_documents_batch(_ids(0, 50), seed=44)
    assert a.column("text").to_pylist() != b.column("text").to_pylist()
