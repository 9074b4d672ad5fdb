"""Exact set-similarity join (AllPairs prefix filter) vs an all-pairs
brute force: the operator's contract is ZERO false negatives and exact
Jaccard values, so the test is set-equality, not recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0],
        promote_options="default",
    )


def _brute_force(sf_dir: str, threshold: float, k: int) -> dict[tuple, float]:
    """All-pairs exact shingle-set Jaccard over the planted-dup corpus,
    computed with Python sets — independent of the engine's hash path
    up to u64 shingle-hash collisions (none at this scale)."""
    import pyarrow.parquet as pq

    from antnre_ray.functions.minhash import shingle_batch
    from antnre_ray.pipelines.extras import DUP_OFFSET, _mutate_batch

    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    dups = _mutate_batch(base)
    ids = base.column("doc_id").to_pylist() + dups.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist() + dups.column("text").to_pylist()
    sets = []
    for t in texts:
        flat, _ = shingle_batch([t], k)
        sets.append(frozenset(flat))
    out: dict[tuple, float] = {}
    n = len(ids)
    for i in range(n):
        si = sets[i]
        if not si:
            continue
        for j in range(i + 1, n):
            sj = sets[j]
            if not sj:
                continue
            inter = len(si & sj)
            if inter == 0:
                continue
            jac = inter / (len(si) + len(sj) - inter)
            if jac >= threshold:
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                out[key] = jac
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_setjoin_equals_brute_force(ray_session, sf001, threshold):
    from antnre_ray.pipelines.extras import documents_with_dups
    from antnre_ray.stages.dedup import set_similarity_join

    got_t = _collect(
        set_similarity_join(documents_with_dups(sf001), threshold=threshold, k=3)
    )
    got = {
        (a, b): j
        for a, b, j in zip(
            got_t.column("doc_a").to_pylist(),
            got_t.column("doc_b").to_pylist(),
            got_t.column("jaccard").to_pylist(),
        )
    }
    want = _brute_force(sf001, threshold, k=3)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12)
    assert len(want) > 0  # planted twins guarantee a non-trivial check


def test_setjoin_finds_every_planted_twin(ray_session, sf001):
    from antnre_ray.pipelines.extras import (
        DUP_OFFSET,
        dedup_setjoin_pairs,
        planted_dup_ids,
    )

    got_t = _collect(dedup_setjoin_pairs(sf001))
    pairs = set(
        zip(got_t.column("doc_a").to_pylist(), got_t.column("doc_b").to_pylist())
    )
    planted = planted_dup_ids(sf001)
    # exactness: every planted twin whose TRUE Jaccard clears the 0.5
    # threshold MUST be present (one short doc's twin lands at ~0.45 —
    # correctly excluded, so qualify against the brute-force truth)
    truth = _brute_force(sf001, 0.5, k=3)
    qualifying = [d for d in planted if (d, d + DUP_OFFSET) in truth]
    assert len(qualifying) >= 0.9 * len(planted)  # the corpus stays non-trivial
    hits = sum((d, d + DUP_OFFSET) in pairs for d in qualifying)
    assert hits == len(qualifying)
