"""Golden E2E: the Ray flagship must reproduce the committed reference
triples (the operational "reference checkpoint outputs", SURVEY.md
§7.4.2) and clear the P/R≥0.95 gate vs gold annotations
(BASELINE.json:2). Also partition-count invariance (SURVEY.md §4.3/§5.2)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FIX = "tests/fixtures"


def _key(t: pa.Table) -> list[tuple]:
    """Triple identity: spans + types + predicate. Scores are compared
    separately with tolerance — float32 matmul blocking wobbles ~1e-5
    with batch shape, and triple identity must not depend on it."""
    return sorted(
        (
            r["doc_id"], r["sent_id"],
            r["subj"]["start"], r["subj"]["end"], r["subj"]["ent_type"],
            r["pred"],
            r["obj"]["start"], r["obj"]["end"], r["obj"]["ent_type"],
        )
        for r in t.to_pylist()
    )


def _scores_by_key(t: pa.Table) -> dict[tuple, float]:
    return {
        (
            r["doc_id"], r["sent_id"],
            r["subj"]["start"], r["subj"]["end"], r["pred"],
            r["obj"]["start"], r["obj"]["end"],
        ): r["score"]
        for r in t.to_pylist()
    }


def test_reference_path_matches_committed_golden(tiny_corpus):
    from antnre_ray.pipelines.flagship import reference_triples

    docs, _ = tiny_corpus
    golden = pq.read_table(f"{FIX}/golden_triples.parquet")
    assert _key(reference_triples(docs)) == _key(golden)


def test_prf_gate_vs_gold_annotations(tiny_corpus):
    from antnre_ray.pipelines.evaluate import gold_triple_keys, prf, triple_keys
    from antnre_ray.pipelines.flagship import reference_triples

    docs, gold = tiny_corpus
    m = prf(triple_keys(reference_triples(docs)), gold_triple_keys(gold))
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m


@pytest.mark.usefixtures("ray_session")
def test_ray_flagship_equals_golden_across_partitionings(tiny_corpus):
    import ray
    import ray.data

    from antnre_ray.pipelines.flagship import flagship_triples

    docs, _ = tiny_corpus
    golden_tbl = pq.read_table(f"{FIX}/golden_triples.parquet")
    golden = _key(golden_tbl)
    golden_scores = _scores_by_key(golden_tbl)
    for nparts in (2, 8):
        ds = ray.data.from_arrow(docs).repartition(nparts)
        tbl = pa.concat_tables(
            ray.get(flagship_triples(ds).to_arrow_refs()), promote_options="default"
        )
        assert _key(tbl) == golden, f"partitioning {nparts} diverged from golden"
        scores = _scores_by_key(tbl)
        worst = max(abs(scores[k] - golden_scores[k]) for k in golden_scores)
        assert worst < 1e-3, f"score drift {worst}"
