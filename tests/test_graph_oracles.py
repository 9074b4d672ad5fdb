"""Template semantics of the round-5 recursive-CTE graph oracles.

The conformance suite runs the registered SQL against the real corpus
adjacency, which is a SINGLE connected component at every sf — so the
oracle templates' multi-component labeling, unreachable -1 convention,
self-loop handling and hop-bound termination are never exercised there.
This file points the ADJ_ORACLE_PATH symlink at a PLANTED adjacency
(two components + a self-loop-only node, weighted, one direction per
edge) and checks the registered SQL strings against an independent
local reference (union-find / BFS / Dijkstra / brute-force triangles).
The engine sides are already reference-tested in test_bfs/test_sssp/
test_invariants; together the two halves pin both legs of the sweep.
"""

from __future__ import annotations

import heapq
import os
import shutil
import uuid
from contextlib import contextmanager

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# planted adjacency: component A = {a, b, c} (a->b w1, b->c w5, a->c w7),
# component B = {x, y} (x->y w2), plus z with only a self-loop (z->z w9).
# seeds per the engine rule: min(src)='a', min(dst)='b'.
EDGES = [
    ("a", "b", 1),
    ("b", "c", 5),
    ("a", "c", 7),
    ("x", "y", 2),
    ("z", "z", 9),
]
NODES = sorted({u for u, _, _ in EDGES} | {v for _, v, _ in EDGES})
SEEDS = {"a", "b"}


@contextmanager
def _flipped_adjacency(edges, tag):
    """Write a planted (src, dst, weight) adjacency under /tmp, flip the
    ADJ_ORACLE_PATH symlink to it atomically (symlink-to-temp +
    os.replace, the same protocol kg_queries._adjacency_snapshot uses),
    and on exit restore the previous link target — so later tests and
    the memoized snapshot machinery see what they expect — then remove
    the planted dir (no /tmp accumulation across pytest runs)."""
    from antnre_ray.pipelines.kg_queries import ADJ_ORACLE_PATH

    snap = f"/tmp/antnre_oracle/test_{tag}_{uuid.uuid4().hex[:8]}"
    os.makedirs(snap, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.string()),
                "dst": pa.array([e[1] for e in edges], pa.string()),
                "weight": pa.array([e[2] for e in edges], pa.int64()),
            }
        ),
        f"{snap}/part.parquet",
    )
    prev = os.readlink(ADJ_ORACLE_PATH) if os.path.islink(ADJ_ORACLE_PATH) else None
    os.makedirs(os.path.dirname(ADJ_ORACLE_PATH), exist_ok=True)
    tmp = f"{ADJ_ORACLE_PATH}.lnk.{uuid.uuid4().hex[:8]}"
    os.symlink(snap, tmp)
    os.replace(tmp, ADJ_ORACLE_PATH)
    try:
        yield snap
    finally:
        if prev is not None:
            tmp = f"{ADJ_ORACLE_PATH}.lnk.{uuid.uuid4().hex[:8]}"
            os.symlink(prev, tmp)
            os.replace(tmp, ADJ_ORACLE_PATH)
        else:
            os.unlink(ADJ_ORACLE_PATH)
        shutil.rmtree(snap, ignore_errors=True)


@pytest.fixture(scope="module")
def planted_link():
    """The two-component planted adjacency, flipped in for the module."""
    with _flipped_adjacency(EDGES, "planted") as snap:
        yield snap


def _sql(name: str) -> str:
    from antnre_ray.pipelines.registry import load_all

    sql = load_all()[name][1]
    assert sql is not None
    return sql


def _und():
    adj: dict[str, list[tuple[str, int]]] = {n: [] for n in NODES}
    for u, v, w in EDGES:
        adj[u].append((v, w))
        adj[v].append((u, w))
    return adj


def test_components_sql_multi_component(planted_link):
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}
    got = dict(duckdb.connect().execute(_sql("kg_components")).fetchall())
    assert got == want


def test_bfs_sql_unreachable_minus_one(planted_link):
    # BFS from {a, b}: component B and the self-loop node are -1
    adj = _und()
    want = {n: -1 for n in NODES}
    frontier = [(n, 0) for n in sorted(SEEDS)]
    while frontier:
        n, d = frontier.pop(0)
        if want[n] != -1 and want[n] <= d:
            continue
        want[n] = d
        frontier.extend((m, d + 1) for m, _ in adj[n])
    assert want == {"a": 0, "b": 0, "c": 1, "x": -1, "y": -1, "z": -1}
    got = dict(duckdb.connect().execute(_sql("kg_bfs_depth")).fetchall())
    assert got == want


def test_sssp_sql_weighted_and_unreachable(planted_link):
    # Dijkstra from {a, b}: c reached at min(7, 1+5... ) — via b->c = 5
    adj = _und()
    dist = {n: float("inf") for n in NODES}
    h = [(0, s) for s in sorted(SEEDS)]
    while h:
        d, n = heapq.heappop(h)
        if d > dist[n]:
            continue
        dist[n] = d
        for m, w in adj[n]:
            if d + w < dist[m]:
                dist[m] = d + w
                heapq.heappush(h, (d + w, m))
    want = {n: (int(d) if d != float("inf") else -1) for n, d in dist.items()}
    assert want == {"a": 0, "b": 0, "c": 5, "x": -1, "y": -1, "z": -1}
    got = dict(duckdb.connect().execute(_sql("kg_shortest_path")).fetchall())
    assert got == want


def test_triangles_sql_self_loop_dropped(planted_link):
    # one triangle (a, b, c); the z self-loop and component B add none
    (got,) = duckdb.connect().execute(_sql("kg_triangles")).fetchone()
    assert got == 1


def _harmonic_ref(edges, k=8):
    """Independent reference for the kg_harmonic contract: md5 bottom-k
    landmarks, BFS depths, Ĉ(v) = (n−1)/|L∖{v}| · Σ 1/d, rounded
    half-away to 6."""
    import hashlib
    from collections import deque

    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    lms = sorted(nodes, key=lambda n: (hashlib.md5(n.encode()).hexdigest(), n))[: min(k, len(nodes))]
    inv = {n: 0.0 for n in nodes}
    for lm in lms:
        depth = {lm: 0}
        q = deque([lm])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in depth:
                    depth[w] = depth[u] + 1
                    q.append(w)
        for n, d in depth.items():
            if d > 0:
                inv[n] += 1.0 / d
    n_nodes, kk = len(nodes), len(lms)
    out = {}
    for n in nodes:
        denom = float(kk) - (1.0 if n in lms else 0.0)
        scale = float(n_nodes - 1) / denom if denom > 0 else 0.0
        import numpy as np

        from antnre_ray.functions.rounding import round_half_away

        out[n] = float(round_half_away(np.array([inv[n] * scale]), 6)[0])
    top = sorted(out.items(), key=lambda t: (-t[1], t[0]))[:20]
    return dict(top)


def test_harmonic_sql_multi_component_exact(planted_link):
    # 6 nodes → LIMIT 8 selects ALL nodes as landmarks → the estimator
    # is exact: triangle nodes 2.0 each, the x-y pair 1.0, self-loop-only
    # z contributes/receives 0 (unreachable convention)
    got = dict(duckdb.connect().execute(_sql("kg_harmonic")).fetchall())
    want = {"a": 2.0, "b": 2.0, "c": 2.0, "x": 1.0, "y": 1.0, "z": 0.0}
    assert got == want
    assert got == _harmonic_ref([(u, v) for u, v, _ in EDGES])


@pytest.mark.usefixtures("ray_session")
def test_harmonic_md5_landmark_subset_three_way(tmp_path):
    """>8 nodes so the md5 bottom-8 landmark rule actually SELECTS a
    subset: registered SQL, engine leg (landmark_key='md5',
    rounding='half_away6'), and the local reference must agree."""
    import ray
    import ray.data

    from antnre_ray.stages.graph_algos import harmonic_centrality

    # 12-node path p00—p01—…—p11 plus a detached pair (q0—q1)
    path = [(f"p{i:02d}", f"p{i+1:02d}") for i in range(11)]
    edges = [(u, v, 1) for u, v in path] + [("q0", "q1", 1)]
    with _flipped_adjacency(edges, "harmonic") as snap:
        ref = _harmonic_ref([(u, v) for u, v, _ in edges], k=8)
        got_sql = dict(duckdb.connect().execute(_sql("kg_harmonic")).fetchall())
        assert got_sql == ref
        eng = harmonic_centrality(
            ray.data.read_parquet(snap, columns=["src", "dst"]),
            k_landmarks=8,
            max_iters=64,
            landmark_key="md5",
            rounding="half_away6",
        ).sort(["centrality", "node"], descending=[True, False]).limit(20)
        got_eng = {r["node"]: r["centrality"] for r in eng.take_all()}
        assert got_eng == ref


@pytest.mark.usefixtures("ray_session")
def test_quality_report_sql_planted_violations(tmp_path):
    """The data_quality_report SQL template must agree with
    stages/expect.expectations_report ON VIOLATIONS too (the corpus
    satisfies every rule, so the sweep never exercises failures):
    plant a null event_id, a duplicated key, a null AND an
    out-of-range user_id, and compare both legs row-for-row."""
    import pandas as pd
    import ray
    import ray.data

    from antnre_ray.pipelines.registry import load_all
    from antnre_ray.stages import expect as ex

    t = pa.table(
        {
            "event_id": pa.array([1, 1, None, 4, 5], pa.int64()),
            "event_type": pa.array(["a", "b", "c", None, "e"], pa.string()),
            "user_id": pa.array([10, -3, None, 7, 2 * 10**12], pa.int64()),
        }
    )
    events = tmp_path / "events.parquet"
    pq.write_table(t, str(events))

    rules = [
        ex.not_null("event_id"),
        ex.not_null("event_type"),
        ex.unique("event_id"),
        ex.in_range("user_id", 0, 10**12),
        ex.row_count_between(1, 10**12),
    ]
    got = ex.expectations_report(ray.data.read_parquet(str(events)), rules).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{events}')")
    want = con.execute(_sql("data_quality_report")).fetchdf()

    got = got.sort_values(["rule", "column"]).reset_index(drop=True)
    want = want.sort_values(["rule", "column"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # the planted violations are actually seen: nothing passes except
    # the row-count rule (rule-name sort order: in_range, not_null x2,
    # row_count_between, unique)
    assert list(got.sort_values("rule")["passed"]) == [False, False, False, True, False]


def test_harmonic_arg_validation_is_eager():
    """Bad landmark_key / rounding must raise at function entry — before
    any distributed work (edges=None would explode later if validation
    were deferred, which is exactly what this pins)."""
    from antnre_ray.stages.graph_algos import harmonic_centrality

    with pytest.raises(ValueError, match="landmark_key"):
        harmonic_centrality(None, landmark_key="sha1")
    with pytest.raises(ValueError, match="rounding"):
        harmonic_centrality(None, rounding="half_away_6")


def _pagerank_ref(edges, seeds=None, iters=10, d=0.85):
    """Dense local PageRank mirroring graph_algos._pagerank_small:
    rank' = ((1-d) + d*dangling)*r0 + d*contribs, dangling/teleport
    mass to the restart distribution r0."""
    import numpy as np

    nodes = sorted({u for u, v, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _, _ in edges:
        deg[idx[u]] += 1.0
    if seeds is None:
        r0 = np.full(n, 1.0 / n)
    else:
        r0 = np.zeros(n)
        for s in seeds:
            r0[idx[s]] = 1.0 / len(seeds)
    rank = r0.copy()
    for _ in range(iters):
        dangling = rank[deg == 0.0].sum()
        acc = np.zeros(n)
        for u, v, _ in edges:
            ui = idx[u]
            if deg[ui] > 0:
                acc[idx[v]] += rank[ui] / deg[ui]
        rank = (1.0 - d + d * dangling) * r0 + d * acc
    return {nodes[i]: round(float(rank[i]), 8) for i in range(n)}


def test_pagerank_sql_planted_exact(planted_link):
    """The unrolled 10-round CTE chain on the planted graph (dangling
    nodes c and y, a self-loop on z — self loops are KEPT by pagerank
    semantics, unlike kcore) must match a dense local power iteration
    to the registered 8-decimal rounding."""
    got = dict(duckdb.connect().execute(_sql("kg_pagerank")).fetchall())
    want = _pagerank_ref(EDGES)
    assert set(got) == set(want)
    for n2, r in want.items():
        assert abs(got[n2] - r) <= 1e-8, (n2, got[n2], r)


def test_ppr_sql_planted_seeds_exact(planted_link):
    """Personalized variant: the seeds CTE must resolve to the engine
    rule (min(src)='a' UNION min(dst)='b') and the restart mass must be
    confined to them — component B and z receive rank ONLY via the
    (1-d)*r0 term, i.e. zero."""
    got = dict(duckdb.connect().execute(_sql("kg_ppr")).fetchall())
    want = _pagerank_ref(EDGES, seeds=sorted(SEEDS))
    assert set(got) == set(want)
    for n2, r in want.items():
        assert abs(got[n2] - r) <= 1e-8, (n2, got[n2], r)
    assert got["x"] == 0.0 and got["y"] == 0.0 and got["z"] == 0.0


def test_kcore_sql_planted_peel(planted_link):
    """2-core of the planted graph: the a-b-c triangle survives, the
    x-y pendant pair peels (degree 1), and z peels because its only
    edge is a self-loop (dropped by simple-graph normalization)."""
    got = [r[0] for r in duckdb.connect().execute(_sql("kg_kcore")).fetchall()]
    assert got == ["a", "b", "c"]


@pytest.mark.usefixtures("ray_session")
def test_labelprop_sql_planted_three_way():
    """kg_label_prop's unrolled vote chain: registered SQL, engine leg
    (label_key='md5') and a local synchronous-LPA reference must agree
    on a planted graph chosen to NOT converge in 10 rounds (two
    triangles bridged by an edge + a pendant pair + a self-loop-only
    node) — the iteration-capped case both legs must cap identically."""
    from collections import Counter

    import numpy as np
    import ray
    import ray.data

    from antnre_ray.functions.hashing import md5_u64_array
    from antnre_ray.stages.graph_algos import label_propagation

    edges = [
        ("a", "b", 1), ("b", "c", 1), ("a", "c", 1), ("c", "d", 1),
        ("d", "e", 1), ("e", "f", 1), ("d", "f", 1), ("x", "y", 1),
        ("z", "z", 1),
    ]
    with _flipped_adjacency(edges, "labelprop") as snap:
        nodes = sorted(
            {u for u, v, _ in edges if u != v} | {v for u, v, _ in edges if u != v}
        )
        lab = {n: int(md5_u64_array([n])[0] >> np.uint64(1)) for n in nodes}
        adj: dict[str, set] = {n: set() for n in nodes}
        for u, v, _ in edges:
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
        for _ in range(10):
            new = {
                n: sorted(
                    Counter(lab[m] for m in adj[n]).items(),
                    key=lambda kv: (-kv[1], kv[0]),
                )[0][0]
                for n in nodes
            }
            if new == lab:
                break
            lab = new
        got_sql = dict(duckdb.connect().execute(_sql("kg_label_prop")).fetchall())
        assert got_sql == lab
        eng = label_propagation(
            ray.data.read_parquet(snap, columns=["src", "dst"]), label_key="md5"
        ).sort("node")
        assert {r["node"]: r["label"] for r in eng.take_all()} == lab


def test_labelprop_label_key_validation_is_eager():
    from antnre_ray.stages.graph_algos import label_propagation

    with pytest.raises(ValueError, match="label_key"):
        label_propagation(None, label_key="sha256")
