"""Multi-source BFS hop depth — stages/graph_algos.bfs_depth.

Hop distances must match a driver-side reference BFS, both regimes must
agree, unreachable nodes come back as -1, and the result is
partition-invariant."""

from __future__ import annotations

from collections import deque

import ray

from antnre_ray.stages.graph_algos import bfs_depth


def _ref_bfs(edges, seeds):
    adj: dict[str, set[str]] = {}
    for e in edges:
        adj.setdefault(e["src"], set()).add(e["dst"])
        adj.setdefault(e["dst"], set()).add(e["src"])
    depth = {n: -1 for n in adj}
    q = deque()
    for s in seeds:
        if s in adj and depth[s] == -1:
            depth[s] = 0
            q.append(s)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if depth[v] == -1:
                depth[v] = depth[u] + 1
                q.append(v)
    return depth


def _depths(ds, seeds, **kw):
    return {r["node"]: r["depth"] for r in bfs_depth(ds, seeds, **kw).take_all()}


def _chain_plus_island():
    # a0-a1-a2-a3-a4 chain, b0-b1 island
    edges = [{"src": f"a{i}", "dst": f"a{i+1}"} for i in range(4)]
    edges.append({"src": "b0", "dst": "b1"})
    return edges


def test_single_source_chain(ray_session):
    edges = _chain_plus_island()
    out = _depths(ray.data.from_items(edges), ["a0"])
    assert out == _ref_bfs(edges, ["a0"])
    assert out["a4"] == 4 and out["b0"] == -1 and out["b1"] == -1


def test_multi_source_takes_nearest_seed(ray_session):
    edges = _chain_plus_island()
    out = _depths(ray.data.from_items(edges), ["a0", "a4", "b1"])
    ref = _ref_bfs(edges, ["a0", "a4", "b1"])
    assert out == ref
    assert out["a2"] == 2 and out["a3"] == 1 and out["b0"] == 1


def test_matches_reference_on_denser_graph(ray_session):
    # deterministic pseudo-random graph: 40 nodes, u->(u*7+k)%40 edges
    edges = [
        {"src": f"n{u}", "dst": f"n{(u * 7 + k) % 40}"}
        for u in range(40)
        for k in (1, 3)
        if u != (u * 7 + k) % 40
    ]
    seeds = ["n0", "n13"]
    out = _depths(ray.data.from_items(edges), seeds)
    assert out == _ref_bfs(edges, seeds)


def test_regime_equivalence_and_partition_invariance(ray_session):
    edges = _chain_plus_island()
    ds = ray.data.from_items(edges)
    small = _depths(ds.repartition(1), ["a1", "b0"])
    small7 = _depths(ds.repartition(7), ["a1", "b0"])
    shuffle = _depths(ds.repartition(7), ["a1", "b0"], small_graph_nodes=0)
    assert small == small7 == shuffle == _ref_bfs(edges, ["a1", "b0"])


def test_no_seed_in_graph_all_unreachable(ray_session):
    edges = _chain_plus_island()
    out = _depths(ray.data.from_items(edges), ["zzz"])
    assert set(out.values()) == {-1}


def test_duplicate_and_reversed_edges_ignored(ray_session):
    edges = _chain_plus_island()
    doubled = edges + [{"src": e["dst"], "dst": e["src"]} for e in edges]
    assert _depths(ray.data.from_items(edges), ["a0"]) == _depths(
        ray.data.from_items(doubled), ["a0"]
    )


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["kg_bfs_depth"]
    # oracle-backed since round 5 (DuckDB recursive-CTE walk over the
    # written adjacency); the side-by-side match runs in
    # test_oracle_conformance — here we pin the engine-side semantics
    assert sql is not None and "WITH RECURSIVE" in sql
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"node", "depth"}
    depths = [r["depth"] for r in rows]
    # the two seeds themselves sit at depth 0; depths are -1 or >= 0
    assert 0 in depths and all(d >= -1 for d in depths)
