"""Weighted shortest path — stages/graph_algos.shortest_path.

Distances must match a driver-side Dijkstra, unit weights must agree
with bfs_depth, both regimes must agree, directed mode must respect
edge direction, and negative weights must be rejected."""

from __future__ import annotations

import heapq

import pytest
import ray

from antnre_ray.stages.graph_algos import bfs_depth, shortest_path


def _ref_dijkstra(edges, seeds, directed=False):
    adj: dict[str, list[tuple[str, int]]] = {}
    for e in edges:
        adj.setdefault(e["src"], []).append((e["dst"], e.get("w", 1)))
        adj.setdefault(e["dst"], [])
        if not directed:
            adj[e["dst"]].append((e["src"], e.get("w", 1)))
    dist = {n: -1 for n in adj}
    pq = [(0, s) for s in seeds if s in adj]
    for _, s in pq:
        dist[s] = 0
    heapq.heapify(pq)
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in adj[u]:
            nd = d + w
            if dist[v] == -1 or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _dists(ds, seeds, **kw):
    return {r["node"]: r["dist"] for r in shortest_path(ds, seeds, **kw).take_all()}


def _weighted_graph():
    # triangle with a shortcut: a-b (1), b-c (1), a-c (5), c-d (2); e-f island (3)
    return [
        {"src": "a", "dst": "b", "w": 1},
        {"src": "b", "dst": "c", "w": 1},
        {"src": "a", "dst": "c", "w": 5},
        {"src": "c", "dst": "d", "w": 2},
        {"src": "e", "dst": "f", "w": 3},
    ]


def test_weighted_matches_dijkstra(ray_session):
    edges = _weighted_graph()
    out = _dists(ray.data.from_items(edges), ["a"], weight_col="w")
    assert out == _ref_dijkstra(edges, ["a"])
    # the 2-hop path a-b-c (cost 2) beats the direct a-c edge (cost 5)
    assert out["c"] == 2 and out["d"] == 4 and out["e"] == -1


def test_unit_weights_equal_bfs(ray_session):
    edges = _weighted_graph()
    ds = ray.data.from_items(edges)
    sp = _dists(ds, ["a", "f"])  # weight_col=None → unit weights
    bfs = {r["node"]: r["depth"] for r in bfs_depth(ds, ["a", "f"]).take_all()}
    assert sp == bfs


def test_directed_respects_direction(ray_session):
    edges = [{"src": "a", "dst": "b", "w": 2}, {"src": "c", "dst": "b", "w": 1}]
    out = _dists(ray.data.from_items(edges), ["a"], weight_col="w", directed=True)
    # b reachable via a->b; c has no incoming path from a
    assert out["b"] == 2 and out["c"] == -1
    und = _dists(ray.data.from_items(edges), ["a"], weight_col="w")
    assert und["c"] == 3  # a->b (2) + b<-c reversed (1)


def test_multi_source_nearest(ray_session):
    edges = _weighted_graph()
    out = _dists(ray.data.from_items(edges), ["a", "d"], weight_col="w")
    assert out == _ref_dijkstra(edges, ["a", "d"])
    assert out["c"] == 2  # min(via a: 2, via d: 2)


def test_regime_equivalence_and_partition_invariance(ray_session):
    edges = _weighted_graph()
    ds = ray.data.from_items(edges)
    small = _dists(ds.repartition(1), ["a"], weight_col="w")
    small7 = _dists(ds.repartition(7), ["a"], weight_col="w")
    shuffle = _dists(ds.repartition(7), ["a"], weight_col="w", small_graph_nodes=0)
    assert small == small7 == shuffle == _ref_dijkstra(edges, ["a"])


def test_negative_weight_rejected(ray_session):
    edges = [{"src": "a", "dst": "b", "w": -1}]
    with pytest.raises(Exception, match="negative weight"):
        shortest_path(ray.data.from_items(edges), ["a"], weight_col="w").take_all()


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["kg_shortest_path"]
    # oracle-backed since round 5 (DuckDB recursive-CTE walk over the
    # written adjacency); the side-by-side match runs in
    # test_oracle_conformance — here we pin the engine-side semantics
    assert sql is not None and "WITH RECURSIVE" in sql
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"node", "dist"}
    dists = [r["dist"] for r in rows]
    assert 0 in dists and all(d >= -1 for d in dists)


def test_denser_graph_matches_dijkstra(ray_session):
    # deterministic graph: 30 nodes, edges u->(u*7+k)%30 weighted (u+k)%5+1
    edges = [
        {"src": f"n{u}", "dst": f"n{(u * 7 + k) % 30}", "w": (u + k) % 5 + 1}
        for u in range(30)
        for k in (1, 3, 9)
        if u != (u * 7 + k) % 30
    ]
    out = _dists(ray.data.from_items(edges), ["n0"], weight_col="w")
    assert out == _ref_dijkstra(edges, ["n0"])
