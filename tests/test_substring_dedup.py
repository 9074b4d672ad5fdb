"""Exact substring (token-window) dedup — stages/dedup.substring_dedup.

Semantics under test (the ExactSubstr contract, Lee et al. 2022):
every duplicated run of ≥ w tokens keeps exactly one occurrence — the
lexicographic-min (doc_id, pos) — and all other occurrences are excised
from their documents' text at original character offsets."""

from __future__ import annotations

import pytest
import ray

from antnre_ray.stages.dedup import substring_dedup

PASSAGE = " ".join(f"p{i}" for i in range(12))

DOCS = [
    {"doc_id": 1, "text": "alpha beta " + PASSAGE + " gamma delta"},  # keeper
    {"doc_id": 2, "text": "one two three four five six seven eight nine ten eleven twelve"},
    {"doc_id": 3, "text": "start " + PASSAGE},          # dup at doc end
    {"doc_id": 4, "text": PASSAGE + " tail words here"},  # dup at doc start
    {"doc_id": 5, "text": "self " + PASSAGE + " mid " + PASSAGE},  # self-repeat
    {"doc_id": 6, "text": "short doc"},                  # < w tokens
]

EXPECT = {
    1: ("alpha beta " + PASSAGE + " gamma delta", 0),  # min doc_id keeps all
    2: ("one two three four five six seven eight nine ten eleven twelve", 0),
    3: ("start", 12),
    4: ("tail words here", 12),
    5: ("self mid", 24),  # both copies removed (keeper lives in doc 1)
    6: ("short doc", 0),
}


def _run(ds, w=10):
    return {
        r["doc_id"]: (r["text"], r["removed_tokens"])
        for r in substring_dedup(ds, w=w).take_all()
    }


def test_excision_semantics(ray_session):
    out = _run(ray.data.from_items(DOCS))
    assert out == EXPECT


def test_partition_invariance(ray_session):
    ds = ray.data.from_items(DOCS)
    assert _run(ds.repartition(1)) == _run(ds.repartition(5))


def test_below_window_passage_survives(ray_session):
    short = " ".join(f"s{i}" for i in range(9))  # 9 < w=10 tokens
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b " + short},
            {"doc_id": 2, "text": short + " x y"},
        ]
    )
    out = _run(ds)
    assert out[1][1] == 0 and out[2][1] == 0


def test_whitespace_outside_cuts_survives(ray_session):
    """Untouched regions keep their ORIGINAL whitespace; the cut swallows
    exactly one separator."""
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "lead  text\t" + PASSAGE},
            {"doc_id": 2, "text": "pre1  pre2 " + PASSAGE + " post1\t\tpost2"},
        ]
    )
    out = _run(ds)
    assert out[1] == ("lead  text\t" + PASSAGE, 0)
    assert out[2] == ("pre1  pre2 post1\t\tpost2", 12)


def test_planted_corpus_copies_shrink(ray_session, sf001):
    """Over the standard planted-dup corpus (every 25th word mutated),
    the +DUP_OFFSET copies lose most of their text at w=15 while every
    original survives verbatim."""
    from antnre_ray.pipelines.extras import DUP_OFFSET, documents_with_dups

    import pyarrow.parquet as pq

    originals = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf001}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    out = _run(documents_with_dups(sf001), w=15)
    copies = [k for k in out if k >= DUP_OFFSET]
    assert copies, "planted corpus must contain mutated copies"
    shrunk = sum(1 for k in copies if out[k][1] > 0)
    assert shrunk / len(copies) >= 0.9  # 24-token shared runs >> w=15
    # Originals may lose text only to NATURAL corpus-level duplication
    # (interleaved docs can share generator phrases); any original with
    # zero removals must be byte-identical to its input.
    untouched = [k for k, v in out.items() if k < DUP_OFFSET and v[1] == 0]
    assert untouched
    for k in untouched:
        assert out[k][0] == originals[k]


@pytest.mark.parametrize("parts", [1, 4])
def test_registry_entry_runs(ray_session, sf001, parts):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["dedup_substring"]
    assert sql is None  # rows-only: the driver window is saturated (r3)
    ds = fn(sf001)
    rows = ds.take_all()
    assert len(rows) > 0
    assert set(rows[0]) == {"doc_id", "text", "removed_tokens"}
