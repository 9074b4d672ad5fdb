"""Personalized PageRank — graph_algos.pagerank(personalization=...).

PPR must match the dense reference in both regimes, concentrate mass
near the seeds, leave classic PageRank bit-compatible with its old
update rule, and reject seed sets absent from the graph."""

from __future__ import annotations

import pytest
import ray

from antnre_ray.stages.graph_algos import pagerank, pagerank_local


def _star_plus_chain():
    # hub h with spokes s0..s3, plus a far chain c0-c1-c2 linked from s0
    edges = [{"src": "h", "dst": f"s{i}"} for i in range(4)]
    edges += [{"src": f"s{i}", "dst": "h"} for i in range(4)]
    edges += [
        {"src": "s0", "dst": "c0"},
        {"src": "c0", "dst": "c1"},
        {"src": "c1", "dst": "c2"},
    ]
    return edges


def _ranks(ds, **kw):
    return {r["node"]: r["rank"] for r in pagerank(ds, **kw).take_all()}


def test_ppr_matches_reference_both_regimes(ray_session):
    edges = _star_plus_chain()
    pairs = [(e["src"], e["dst"]) for e in edges]
    ref = pagerank_local(pairs, personalization=["h"])
    ds = ray.data.from_items(edges).repartition(5)
    small = _ranks(ds, personalization=["h"])
    shuffle = _ranks(ds, personalization=["h"], small_graph_nodes=0)
    assert set(small) == set(ref) == set(shuffle)
    for n in ref:
        assert small[n] == pytest.approx(ref[n], abs=1e-9), n
        assert shuffle[n] == pytest.approx(ref[n], abs=1e-9), n


def test_ppr_concentrates_on_seeds(ray_session):
    edges = _star_plus_chain()
    ds = ray.data.from_items(edges)
    ppr = _ranks(ds, personalization=["h"])
    classic = _ranks(ds)
    # seeded hub gains rank vs classic; the far chain end loses
    assert ppr["h"] > classic["h"]
    assert ppr["c2"] < classic["c2"]
    assert sum(ppr.values()) == pytest.approx(1.0, abs=1e-9)


def test_classic_unchanged_by_refactor(ray_session):
    edges = _star_plus_chain()
    pairs = [(e["src"], e["dst"]) for e in edges]
    ref = pagerank_local(pairs)
    ds = ray.data.from_items(edges).repartition(3)
    got = _ranks(ds)
    got_shuffle = _ranks(ds, small_graph_nodes=0)
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-9), n
        assert got_shuffle[n] == pytest.approx(ref[n], abs=1e-9), n


def test_multi_seed(ray_session):
    edges = _star_plus_chain()
    pairs = [(e["src"], e["dst"]) for e in edges]
    ref = pagerank_local(pairs, personalization=["c2", "s1"])
    got = _ranks(ray.data.from_items(edges), personalization=["c2", "s1"])
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-9), n


def test_unknown_seed_rejected(ray_session):
    edges = _star_plus_chain()
    with pytest.raises(Exception, match="no personalization seed"):
        pagerank(ray.data.from_items(edges), personalization=["zzz"]).take_all()
    with pytest.raises(Exception, match="no personalization seed"):
        pagerank(
            ray.data.from_items(edges), personalization=["zzz"], small_graph_nodes=0
        ).take_all()


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["kg_ppr"]
    # oracle-promoted in round 5 (personalized unrolled-CTE replica)
    assert sql is not None and "seeds" in sql
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"node", "rank"}
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True) and ranks[0] > 0
