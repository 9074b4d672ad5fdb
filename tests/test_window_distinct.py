"""Windowed COUNT(DISTINCT) + landmark harmonic centrality."""

from __future__ import annotations

import duckdb
import pytest
import ray

from antnre_ray.stages.graph_algos import bfs_depth, harmonic_centrality


def test_window_distinct_matches_duckdb(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b61_window_distinct"]
    assert sql is not None
    rows = fn(sf001).take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf001}/events.parquet')"
    )
    ref = con.execute(
        """
        SELECT date_trunc('hour', ts) AS bucket,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert len(rows) == len(ref)
    for r, (b, n) in zip(rows, ref):
        assert r["bucket"] == b and r["n_users"] == n


# ---------------------------------------------- harmonic centrality

def _star_chain():
    # star: h—s0..s3; chain off s0: s0—c0—c1
    edges = [{"src": "h", "dst": f"s{i}"} for i in range(4)]
    edges += [{"src": "s0", "dst": "c0"}, {"src": "c0", "dst": "c1"}]
    return edges


def _exact_harmonic(edges):
    adj = {}
    for e in edges:
        adj.setdefault(e["src"], set()).add(e["dst"])
        adj.setdefault(e["dst"], set()).add(e["src"])
    from collections import deque

    out = {}
    for v in adj:
        depth = {v: 0}
        q = deque([v])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in depth:
                    depth[w] = depth[u] + 1
                    q.append(w)
        out[v] = sum(1.0 / d for n, d in depth.items() if d > 0)
    return out


def test_all_node_landmarks_exact(ray_session):
    edges = _star_chain()
    ref = _exact_harmonic(edges)
    got = {
        r["node"]: r["centrality"]
        for r in harmonic_centrality(
            ray.data.from_items(edges), k_landmarks=100
        ).take_all()
    }
    assert set(got) == set(ref)
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-6), n


def test_sampled_landmarks_rank_hub_first(ray_session):
    edges = _star_chain()
    got = {
        r["node"]: r["centrality"]
        for r in harmonic_centrality(
            ray.data.from_items(edges), k_landmarks=4
        ).take_all()
    }
    # the hub dominates the chain tail under any landmark subset
    assert got["h"] > got["c1"]
    assert all(v >= 0 for v in got.values())


def test_disconnected_component_contributes_zero(ray_session):
    edges = _star_chain() + [{"src": "x0", "dst": "x1"}]
    ref = _exact_harmonic(edges)
    got = {
        r["node"]: r["centrality"]
        for r in harmonic_centrality(
            ray.data.from_items(edges), k_landmarks=100
        ).take_all()
    }
    for n in ref:
        assert got[n] == pytest.approx(ref[n], abs=1e-6), n
    # the island pair only reaches each other
    assert got["x0"] == pytest.approx(ref["x0"]) and ref["x0"] == 1.0
