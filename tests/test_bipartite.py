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


# ------------------------------------------- association rules

def test_association_rules_match_reference(ray_session):
    from antnre_ray.stages.graph_algos import association_rules

    edges = _basket_edges()
    rows = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(ray.data.from_items(edges)).take_all()
    }
    # baskets: milk in u1,u2,u3 (3); bread in u1,u2 (2); beer in u3,u4 (2)
    r = rows[("bread", "milk")]
    assert r["support"] == 2
    assert r["confidence"] == 1.0       # both bread baskets have milk
    assert abs(r["lift"] - 2 * 4 / (2 * 3)) < 1e-7  # support·N/(c_a·c_b), rounded to 8
    r2 = rows[("milk", "bread")]
    assert r2["support"] == 2 and abs(r2["confidence"] - 2 / 3) < 1e-7
    # both directions present, symmetric lift
    assert r["lift"] == r2["lift"]
    # beer-milk co-occurs once (u3)
    assert rows[("beer", "milk")]["support"] == 1


def test_association_rules_min_support(ray_session):
    from antnre_ray.stages.graph_algos import association_rules

    edges = _basket_edges()
    rows = association_rules(ray.data.from_items(edges), min_support=2).take_all()
    pairs = {(r["antecedent"], r["consequent"]) for r in rows}
    assert ("bread", "milk") in pairs and ("beer", "milk") not in pairs


def test_association_rules_multiblock_duplicate_edges(ray_session):
    """Round-4 regression: the same (u, v) edge arriving in DIFFERENT
    blocks must not inflate the per-item basket counts (per-batch dedup
    is only a combiner; a global dedup level owns correctness). Caught
    by the DuckDB oracle at sf0.001 — the single-block reference test
    had masked it."""
    import ray

    from antnre_ray.stages.graph_algos import association_rules

    edges = [{"src": f"u{i%4}", "dst": d} for i in range(4) for d in ("milk", "bread")]
    # replicate every edge 5x and FORCE many blocks
    ds = ray.data.from_items(edges * 5).repartition(10)
    rows = {
        (r["antecedent"], r["consequent"]): r for r in association_rules(ds).take_all()
    }
    r = rows[("milk", "bread")]
    # all 4 baskets hold both items: support 4, confidence 1.0, lift 1.0
    assert r["support"] == 4 and r["confidence"] == 1.0 and r["lift"] == 1.0
