"""Property/invariant tests (SURVEY.md §5.2): span-sequence preservation
on random corpora, partition/salt invariance of the wide stages, sketch
accuracy, sorted outputs — seed-driven (hypothesis-style, deterministic)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from antnre_ray.sources.corpus import synthesize_documents
from antnre_ray.stages.validate import span_fingerprints


@pytest.mark.parametrize("seed", [7, 99, 1234])
def test_span_invariant_random_corpora(seed):
    """For every surviving row the spans sequence is preserved on
    (kind, text, media_ref, order) through A2→A3 (BASELINE.json:14)."""
    from antnre_ray.stages.assemble import assemble_batch
    from antnre_ray.stages.validate import validate_batch

    docs, _ = synthesize_documents(48, seed=seed)
    out = assemble_batch(validate_batch(docs))
    assert span_fingerprints(out.column("spans")) == span_fingerprints(docs.column("spans"))


@pytest.mark.parametrize("seed", [3, 11])
def test_extraction_independent_of_batch_slicing(seed):
    """Slicing the sentence stream differently must not change the
    emitted triple set (the 8-vs-32-cpu output-equality property)."""
    from antnre_ray.pipelines.flagship import reference_extractions
    from antnre_ray.stages.assemble import assemble_batch
    from antnre_ray.stages.extract import ExtractorActor
    from antnre_ray.stages.sentencize import sentencize_batch
    from antnre_ray.stages.validate import validate_batch

    docs, _ = synthesize_documents(32, seed=seed)
    whole = reference_extractions(docs)
    sent = sentencize_batch(assemble_batch(validate_batch(docs)))
    actor = ExtractorActor()
    parts = [actor(sent.slice(i, 17)) for i in range(0, sent.num_rows, 17)]
    sliced = pa.concat_tables(parts)

    def keys(t):
        out = []
        for r in t.to_pylist():
            for tr in r["triples"]:
                out.append((r["doc_id"], r["sent_id"], tr["subj_idx"], tr["obj_idx"], tr["pred"]))
        return sorted(out)

    assert keys(whole) == keys(sliced)


def test_canonicalize_independent_of_input_order():
    from antnre_ray.stages.canonicalize import canonicalize_local

    rows = [("d", "Loc", f"City {i % 7}", f"c:{i % 7}") for i in range(100)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "ent_type": pa.array([r[1] for r in rows]),
            "surface": pa.array([r[2] for r in rows]),
            "entity_id": pa.array([r[3] for r in rows]),
        }
    )
    fwd = canonicalize_local(t)
    rev = canonicalize_local(t.take(pa.array(list(reversed(range(100))))))
    assert sorted(map(str, fwd.to_pylist())) == sorted(map(str, rev.to_pylist()))


def test_kmv_sketch_accuracy():
    from antnre_ray.functions.sketch import kmv_estimate, kmv_merge, kmv_partial

    rng = np.random.default_rng(0)
    values = pa.array([f"v{int(x)}" for x in rng.integers(0, 50_000, size=200_000)])
    # split into 8 "blocks", sketch each, merge
    n = len(values)
    partials = [kmv_partial(values.slice(i * n // 8, n // 8)) for i in range(8)]
    est = kmv_estimate(kmv_merge(partials))
    exact = len(set(values.to_pylist()))
    assert abs(est - exact) / exact < 0.10, (est, exact)
    # small-cardinality path is exact
    small = pa.array([f"s{i}" for i in range(100)])
    assert kmv_estimate(kmv_merge([kmv_partial(small)])) == 100.0


def test_kmv_set_ops_accuracy():
    """Theta-sketch union/intersection/difference vs exact on two
    overlapping 60k-element sets (sketch mode), and exact equality in
    the below-k regime."""
    from antnre_ray.functions.sketch import kmv_merge, kmv_partial, kmv_set_estimates

    a_vals = [f"k{i}" for i in range(0, 60_000)]
    b_vals = [f"k{i}" for i in range(40_000, 100_000)]  # 20k overlap
    sa = kmv_merge([kmv_partial(pa.array(a_vals[i::4])) for i in range(4)])
    sb = kmv_merge([kmv_partial(pa.array(b_vals[i::4])) for i in range(4)])
    est = kmv_set_estimates(sa, sb)
    assert abs(est["union"] - 100_000) / 100_000 < 0.10, est
    assert abs(est["intersection"] - 20_000) / 20_000 < 0.20, est
    assert abs(est["a_not_b"] - 40_000) / 40_000 < 0.15, est
    # identities hold exactly within the sketch itself
    assert abs(est["union"] - (est["intersection"] + est["a_not_b"] + (est["union"] - est["intersection"] - est["a_not_b"]))) < 1e-6
    # below-k regime: everything exact
    ea = pa.array([f"x{i}" for i in range(300)])
    eb = pa.array([f"x{i}" for i in range(200, 500)])
    est2 = kmv_set_estimates(kmv_partial(ea), kmv_partial(eb))
    assert est2 == {"union": 500.0, "intersection": 100.0, "a_not_b": 200.0, "theta": 1.0}


def test_hll_sketch_accuracy():
    from antnre_ray.functions.sketch import hll_estimate, hll_merge, hll_partial

    rng = np.random.default_rng(0)
    values = pa.array([f"v{int(x)}" for x in rng.integers(0, 50_000, size=200_000)])
    n = len(values)
    partials = [hll_partial(values.slice(i * n // 8, n // 8)) for i in range(8)]
    est = hll_estimate(hll_merge(partials))
    exact = len(set(values.to_pylist()))
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # merge is order-free and idempotent
    import numpy as _np

    m1 = hll_merge(partials)
    m2 = hll_merge(list(reversed(partials)) + [partials[0]])
    assert _np.array_equal(m1, m2)
    # small-cardinality (linear counting) path stays tight
    small = pa.array([f"s{i}" for i in range(100)])
    est_small = hll_estimate(hll_merge([hll_partial(small)]))
    assert abs(est_small - 100) / 100 < 0.05, est_small


@pytest.mark.usefixtures("ray_session")
def test_b19_sort_order_is_correct(sf001):
    import ray

    from antnre_ray.pipelines.relational import b19_sort

    tbl = pa.concat_tables(ray.get(b19_sort(sf001).to_arrow_refs()), promote_options="default")
    prices = tbl.column("o_totalprice").to_pylist()
    assert prices == sorted(prices, reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_kg_eval_prf_gate(sf001):
    """The P/R≥0.95 gate on the derived corpus (BASELINE.json:2)."""
    from antnre_ray.pipelines.kg_queries import kg_eval_prf

    m = kg_eval_prf(sf001).to_pylist()[0]
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m


@pytest.mark.usefixtures("ray_session")
def test_kg_span_integrity_zero_violations(sf001):
    """Corpus-wide span-sequence invariant query: 0 violations, and the
    row count matches the derived corpus size."""
    from antnre_ray.pipelines.kg_queries import kg_span_integrity

    out = kg_span_integrity(sf001).to_pylist()[0]
    assert out["n_violations"] == 0
    assert out["n_rows"] > 0


@pytest.mark.usefixtures("ray_session")
def test_connected_components_vs_union_find():
    """Distributed min-label propagation == union-find reference on a
    multi-component graph with chains (exercises >1 iteration)."""
    import ray
    import ray.data

    from antnre_ray.stages.graph_algos import components_local, connected_components

    # two chains, one triangle, one isolated edge — plus direction mix
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),          # chain of 5
        ("p", "q"), ("q", "r"), ("r", "p"),                      # triangle
        ("x", "y"),                                              # pair
        ("m1", "m2"), ("m3", "m2"), ("m3", "m4"), ("m5", "m4"),  # zigzag chain
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.string()),
            "dst": pa.array([b for _, b in edges], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {
        r["node"]: r["label"]
        for r in pa.concat_tables(
            ray.get(connected_components(ds).to_arrow_refs()), promote_options="default"
        ).to_pylist()
    }
    want = components_local(edges)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_kg_components_partition_entities_consistently(sf001):
    """Every adjacency endpoint gets exactly one component; endpoints of
    the same edge share it."""
    import ray

    from antnre_ray.pipelines.kg_queries import _graph, kg_components

    labels = pa.concat_tables(
        ray.get(kg_components(sf001).to_arrow_refs()), promote_options="default"
    )
    lab = {r["node"]: r["component"] for r in labels.to_pylist()}
    adj = pa.concat_tables(
        ray.get(_graph(sf001)["adjacency"].to_arrow_refs()), promote_options="default"
    )
    for r in adj.to_pylist():
        assert r["src"] in lab and r["dst"] in lab
        assert lab[r["src"]] == lab[r["dst"]], (r["src"], r["dst"])


@pytest.mark.usefixtures("ray_session")
def test_pagerank_vs_dense_reference():
    """Distributed PageRank == dense numpy reference (atol 1e-9: same
    math, only float summation order differs) on a graph with hubs,
    chains and a dangling node."""
    import numpy as np
    import ray
    import ray.data

    from antnre_ray.stages.graph_algos import pagerank, pagerank_local

    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
        ("hub", "x"), ("x", "y"), ("y", "a"),
        ("c", "dangle"),  # 'dangle' has no out-edges
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.string()),
            "dst": pa.array([b for _, b in edges], pa.string()),
        }
    )
    got = {
        r["node"]: r["rank"]
        for r in pa.concat_tables(
            ray.get(pagerank(ray.data.from_arrow(tbl).repartition(3)).to_arrow_refs()),
            promote_options="default",
        ).to_pylist()
    }
    want = pagerank_local(edges)
    assert got.keys() == want.keys()
    assert max(abs(got[k] - want[k]) for k in want) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


@pytest.mark.usefixtures("ray_session")
def test_graph_regimes_agree():
    """The broadcast small-graph regime and the Dataset-join shuffle
    regime must produce identical components and tolerance-equal
    PageRank on the same graph (small_graph_nodes=0 forces the shuffle
    path)."""
    import numpy as np
    import ray
    import ray.data

    from antnre_ray.stages.graph_algos import connected_components, pagerank

    rng = np.random.default_rng(11)
    n = 40
    src = [f"n{int(i)}" for i in rng.integers(0, n, 120)]
    dst = [f"n{int(i)}" for i in rng.integers(0, n, 120)]
    tbl = pa.table({"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(3)

    def lab_map(out):
        return {
            r["node"]: r["label"]
            for r in pa.concat_tables(
                ray.get(out.to_arrow_refs()), promote_options="default"
            ).to_pylist()
        }

    small = lab_map(connected_components(ds))
    big = lab_map(connected_components(ds, small_graph_nodes=0))
    assert small == big

    def rank_map(out):
        return {
            r["node"]: r["rank"]
            for r in pa.concat_tables(
                ray.get(out.to_arrow_refs()), promote_options="default"
            ).to_pylist()
        }

    rs = rank_map(pagerank(ds, iters=5))
    rb = rank_map(pagerank(ds, iters=5, small_graph_nodes=0))
    assert rs.keys() == rb.keys()
    assert max(abs(rs[k] - rb[k]) for k in rs) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_kcore_vs_reference_peeling():
    """Parallel peeling == sequential reference peeling, in both
    regimes (small_graph_nodes=0 forces the Dataset-join path), on a
    graph with a known core structure plus random noise."""
    import numpy as np
    import ray
    import ray.data

    from antnre_ray.stages.graph_algos import kcore

    def ref_kcore(pairs, k):
        adj: dict[str, set[str]] = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in [n for n, nb in adj.items() if len(nb) < k]:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
        return set(adj)

    rng = np.random.default_rng(17)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    # a clique of 5 (a 4-core) + random sparse noise + chains
    kq = [f"k{i}" for i in range(5)]
    pairs += [(kq[i], kq[j]) for i in range(5) for j in range(i + 1, 5)]
    pairs += [
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in zip(rng.integers(0, 30, 60), rng.integers(0, 30, 60))
    ]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.string()),
            "dst": pa.array([b for _, b in pairs], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)

    def members(out):
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_columns > 0],
            promote_options="default",
        )
        return set(t.column("node").to_pylist()) if t.num_rows else set()

    for k in (2, 3, 4, 5):
        want = ref_kcore(pairs, k)
        got_small = members(kcore(ds, k=k))
        got_large = members(kcore(ds, k=k, small_graph_nodes=0))
        assert got_small == want, (k, got_small ^ want)
        assert got_large == want, (k, got_large ^ want)
    assert members(kcore(ds, k=4)) >= set(kq)  # the clique survives k=4


@pytest.mark.usefixtures("ray_session")
def test_weighted_group_sample_bias_determinism_and_k():
    """E-S weighted sampling: heavy rows dominate inclusion, the draw is
    deterministic and partition-invariant, exactly k per group, and
    zero-weight rows never appear."""
    import ray
    import ray.data

    from antnre_ray.pipelines.relational import weighted_group_sample

    n = 200
    rows = pa.table(
        {
            "g": pa.array(["a"] * n + ["b"] * n, pa.string()),
            "id": pa.array(list(range(n)) + list(range(1000, 1000 + n)), pa.int64()),
            # group a: one heavy row (w=1000) among w=1; group b: one zero-weight row
            "w": pa.array(
                [1000.0] + [1.0] * (n - 1) + [0.0] + [1.0] * (n - 1), pa.float64()
            ),
        }
    )

    def run(seed, nblocks=3):
        ds = ray.data.from_arrow(rows).repartition(nblocks)
        out = weighted_group_sample(ds, "g", "id", "w", k=5, seed=seed)
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_columns > 0],
            promote_options="default",
        )
        return t.sort_by([("g", "ascending"), ("id", "ascending")])

    base = run(42)
    assert base.equals(run(42, nblocks=7))  # partition-invariant
    by_g: dict[str, list[int]] = {}
    for r in base.to_pylist():
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
    assert 1000 not in by_g["b"]  # zero-weight row excluded
    # heavy row (id 0, w=1000 vs 199 ones) lands in the k=5 sample in
    # virtually every draw: P(miss) < (199/1199)^5 ≈ 1e-4 per seed.
    hits = sum(0 in {r["id"] for r in run(s).to_pylist()} for s in range(20))
    assert hits >= 19, hits


def test_tune_data_context_scales_read_block_floor(ray_session):
    """Registry queries apply the CPU-scaled read block floor: Ray's
    default read_op_min_num_blocks=200 shreds bench-scale tables into
    ~2 MB blocks whose per-task overhead dominates (round-5 measurement:
    a 9.6M-row pre-agg at 4 CPUs ran at 11% CPU utilization)."""
    import ray
    import ray.data

    from antnre_ray.config import tune_data_context

    tune_data_context()
    ctx = ray.data.DataContext.get_current()
    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert ctx.read_op_min_num_blocks == max(2 * cpus, 8)

    # and the registry wrapper applies it before building the Dataset
    ctx.read_op_min_num_blocks = 200
    from antnre_ray.pipelines.registry import load_all

    fn, _sql = load_all()["b05_filter"]
    fn("/root/testdata/sf0.001")
    assert ctx.read_op_min_num_blocks == max(2 * cpus, 8)


def test_adjacency_snapshot_invalidates_on_code_change(tmp_path, monkeypatch):
    """The adjacency oracle snapshot is keyed by BOTH corpus identity and
    a package-code fingerprint: a code edit must produce a different
    snapshot dir (round-5 review finding — a corpus-only key silently
    served results computed by retired code), and the fingerprint itself
    must react to a package-file mtime change."""
    import os

    from antnre_ray.pipelines import kg_queries

    sf = "/root/testdata/sf0.001"
    # path computation is pure — no pipeline runs here
    monkeypatch.setattr(kg_queries, "_CODE_FP", "aaaa000000000000")
    p1 = kg_queries._snapshot_dir(sf)
    monkeypatch.setattr(kg_queries, "_CODE_FP", "bbbb111111111111")
    p2 = kg_queries._snapshot_dir(sf)
    assert p1 != p2
    assert os.path.dirname(p1) == kg_queries._ADJ_SNAP_ROOT

    # the real fingerprint: stable within a process, sensitive to mtime
    monkeypatch.setattr(kg_queries, "_CODE_FP", None)
    fp1 = kg_queries._code_fingerprint()
    assert kg_queries._code_fingerprint() == fp1  # memoized
    target = kg_queries.__file__
    st = os.stat(target)
    try:
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        monkeypatch.setattr(kg_queries, "_CODE_FP", None)
        assert kg_queries._code_fingerprint() != fp1
    finally:
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns))
