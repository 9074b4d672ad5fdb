"""Bipartite projection — graph_algos.bipartite_project.

Co-occurrence weights must match a brute-force reference, duplicate
input edges must not inflate weights, the high-degree cap must drop
(not truncate), and the result must be partition-invariant."""

from __future__ import annotations

from itertools import combinations

import ray

from antnre_ray.stages.graph_algos import bipartite_project


def _ref(edges, max_degree=256):
    by_u: dict[str, set[str]] = {}
    for e in edges:
        by_u.setdefault(e["src"], set()).add(e["dst"])
    w: dict[tuple[str, str], int] = {}
    for u, items in by_u.items():
        if len(items) > max_degree:
            continue
        for a, b in combinations(sorted(items), 2):
            w[(a, b)] = w.get((a, b), 0) + 1
    return w


def _got(ds, **kw):
    return {
        (r["item_a"], r["item_b"]): r["weight"]
        for r in bipartite_project(ds, **kw).take_all()
    }


def _basket_edges():
    baskets = {
        "u1": ["milk", "bread", "eggs"],
        "u2": ["milk", "bread"],
        "u3": ["milk", "beer"],
        "u4": ["beer"],
    }
    return [{"src": u, "dst": i} for u, items in baskets.items() for i in items]


def test_matches_reference(ray_session):
    edges = _basket_edges()
    got = _got(ray.data.from_items(edges))
    assert got == _ref(edges)
    assert got[("bread", "milk")] == 2  # u1 and u2


def test_duplicate_edges_not_double_counted(ray_session):
    edges = _basket_edges()
    doubled = edges + edges
    assert _got(ray.data.from_items(doubled)) == _ref(edges)


def test_degree_cap_drops(ray_session):
    edges = _basket_edges()
    # a bot user touching 10 items would add 45 pairs — capped away
    edges += [{"src": "bot", "dst": f"item{i}"} for i in range(10)]
    got = _got(ray.data.from_items(edges), max_degree=5)
    assert got == _ref(edges, max_degree=5)
    assert ("item0", "item1") not in got


def test_partition_invariant(ray_session):
    edges = _basket_edges() * 3
    a = _got(ray.data.from_items(edges).repartition(1))
    b = _got(ray.data.from_items(edges).repartition(9))
    assert a == b == _ref(_basket_edges())
