"""kmeans_assign — the exposed k-means clustering operator."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from antnre_ray.stages.similarity import kmeans_assign


def _toy_embeddings(n=300, dim=8, k_true=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k_true, dim)) * 4
    X = centers[np.arange(n) % k_true] + 0.05 * rng.standard_normal((n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1).astype(np.float32), pa.float32()), dim
            ),
        }
    ), X


def test_partition_invariant_and_consistent(ray_session):
    tbl, X = _toy_embeddings()
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        rows = kmeans_assign(ds, n_clusters=4, dim=8).take_all()
        outs.append({r["vec_id"]: (r["cluster"], r["centroid_sim"]) for r in rows})
    assert outs[0] == outs[1]
    out = outs[0]
    assert len(out) == len(X)
    assert all(0 <= c < 4 for c, _ in out.values())
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for _, s in out.values())
    # planted structure: the 4 generator groups must map 1:1 onto clusters
    by_true = {}
    for vid, (c, _) in out.items():
        by_true.setdefault(vid % 4, set()).add(c)
    assert all(len(cs) == 1 for cs in by_true.values())
    assert len({next(iter(cs)) for cs in by_true.values()}) == 4


def test_assignment_is_nearest_centroid(ray_session):
    """Recompute the operator's own centroid fit (same sample rule, same
    kernel) and check every row's cluster is the brute-force argmax."""
    from antnre_ray.functions.hashing import mix64
    from antnre_ray.stages.similarity import IVF_ITERS, IVF_SAMPLE, _kmeans, _normalize

    tbl, X = _toy_embeddings()
    ids = np.arange(len(X))
    h = mix64(ids.astype(np.int64), seed=42).view(np.int64) ^ np.int64(-(2**63))
    # the operator sorts the sample by (_h, vec_id) then truncates
    order = np.lexsort((ids, h))[:IVF_SAMPLE]
    S = _normalize(X[order].astype(np.float64))
    C = _kmeans(S, 4, IVF_ITERS, 42).astype(np.float32)
    Xn = _normalize(X.astype(np.float64)).astype(np.float32)
    expect = (Xn @ C.T).argmax(axis=1)
    rows = kmeans_assign(ray.data.from_arrow(tbl), n_clusters=4, dim=8).take_all()
    got = np.empty(len(X), dtype=np.int64)
    for r in rows:
        got[r["vec_id"]] = r["cluster"]
    assert (got == expect).all()


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["embed_kmeans"]
    assert sql is None
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"vec_id", "cluster", "centroid_sim"}
    assert len({r["cluster"] for r in rows}) > 1
