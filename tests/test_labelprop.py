"""Label propagation communities — stages/graph_algos.label_propagation.

Deterministic synchronous LPA (min-label tie break): both regimes must
produce identical labelings, recover planted community structure, and be
partition-invariant."""

from __future__ import annotations

import itertools

import ray

from antnre_ray.stages.graph_algos import label_propagation


def _two_cliques(bridge=True):
    a = [f"a{i}" for i in range(5)]
    b = [f"b{i}" for i in range(5)]
    edges = [{"src": u, "dst": v} for u, v in itertools.combinations(a, 2)]
    edges += [{"src": u, "dst": v} for u, v in itertools.combinations(b, 2)]
    if bridge:
        edges.append({"src": "a0", "dst": "b0"})
    return a, b, edges


def _labels(ds, **kw):
    return {r["node"]: r["label"] for r in label_propagation(ds, **kw).take_all()}


def test_two_cliques_form_two_communities(ray_session):
    a, b, edges = _two_cliques()
    out = _labels(ray.data.from_items(edges))
    la = {out[n] for n in a}
    lb = {out[n] for n in b}
    assert len(la) == 1 and len(lb) == 1 and la != lb


def test_regime_equivalence_and_partition_invariance(ray_session):
    _, _, edges = _two_cliques()
    ds = ray.data.from_items(edges)
    small = _labels(ds.repartition(1))
    small7 = _labels(ds.repartition(7))
    large = _labels(ds.repartition(7), small_graph_nodes=0)
    assert small == small7 == large


def test_directionality_and_duplicates_ignored(ray_session):
    """Parallel + reversed edges collapse to the same simple graph."""
    _, _, edges = _two_cliques()
    doubled = edges + [{"src": e["dst"], "dst": e["src"]} for e in edges]
    assert _labels(ray.data.from_items(edges)) == _labels(ray.data.from_items(doubled))


def test_isolated_pair_keeps_distinct_community(ray_session):
    """A disconnected component never inherits a label across the cut."""
    a, b, edges = _two_cliques(bridge=False)
    out = _labels(ray.data.from_items(edges))
    assert {out[n] for n in a} != {out[n] for n in b}


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["kg_label_prop"]
    # oracle-promoted in round 5 (label_key="md5" unrolled vote chain)
    assert sql is not None and "md5_number_lower" in sql
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"node", "label"}
    # communities partition the node set: every node labeled exactly once
    assert len({r["node"] for r in rows}) == len(rows)
