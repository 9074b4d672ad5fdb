"""Zero-column-block join guards under forced empty hash partitions.

Ray 2.49 hash aggregates / map_groups emit zero-COLUMN blocks for empty
hash partitions (output partition count == upstream block count), and
Dataset.join rejects such blocks on EITHER side ("no match for key
field"). These tests pin every guarded site by maximizing the hazard:
key cardinality far below the block count (ds.repartition(many) on tiny
inputs), which makes empty aggregate partitions certain.
"""
import pyarrow as pa
import pytest


def _docs(rows, nblocks=24):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(nblocks)


TWIN = "the quick brown fox jumps over the lazy dog again and again " * 4


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_single_pair_many_blocks():
    """ONE candidate pair over 24 blocks: the pair aggregate emits ~23
    empty partitions; unguarded, the text join crashes."""
    from antnre_ray.stages.dedup import ngram_jaccard_pairs

    docs = _docs([(1, TWIN), (2, TWIN), (3, "totally unrelated short text here")])
    got = ngram_jaccard_pairs(docs, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in got.take_all()}
    assert pairs == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_pairs_zero_pairs():
    """NO candidate pairs at all: the all-empty aggregate loses its
    schema even through repartition; the early-exit must return an
    empty, correctly-typed pair table instead of crashing."""
    from antnre_ray.stages.dedup import ngram_jaccard_pairs

    docs = _docs([(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")])
    got = ngram_jaccard_pairs(docs, threshold=0.5)
    t = got.take_all()
    assert t == []


@pytest.mark.usefixtures("ray_session")
def test_setjoin_pairs_single_pair_many_blocks():
    from antnre_ray.stages.dedup import set_similarity_join

    docs = _docs([(1, TWIN), (2, TWIN), (3, "totally unrelated short text here")])
    got = set_similarity_join(docs, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in got.take_all()}
    assert pairs == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_setjoin_no_shingle_corpus():
    """Every doc shorter than the k-gram window: the token table is
    ALL-empty (schema unrecoverable by repartition) — the df early-exit
    must return an empty pair table."""
    from antnre_ray.stages.dedup import set_similarity_join

    docs = _docs([(1, "too short"), (2, "also tiny")])
    assert set_similarity_join(docs, threshold=0.5, k=3).take_all() == []


@pytest.mark.usefixtures("ray_session")
def test_apply_drop_list_sparse_and_empty():
    import ray

    from antnre_ray.stages.dedup import apply_drop_list

    docs = _docs([(i, f"doc number {i}") for i in range(40)], nblocks=16)
    # sparse: ONE drop key over many blocks
    drops = ray.data.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64())})).repartition(12)
    kept = sorted(r["doc_id"] for r in apply_drop_list(docs, drops).take_all())
    assert kept == [i for i in range(40) if i != 7]
    # empty: nothing to drop — must return docs unchanged, not crash
    empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    kept2 = sorted(r["doc_id"] for r in apply_drop_list(docs, empty).take_all())
    assert kept2 == list(range(40))


def _edges(pairs, nblocks=24):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    ).repartition(nblocks)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_shuffle_tiny_graph_many_blocks():
    """4 nodes over 24 blocks forces empty partitions in the nodes and
    degrees aggregates feeding the rank-init join."""
    from antnre_ray.stages.graph_algos import pagerank, pagerank_local

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    got = {r["node"]: r["rank"] for r in pagerank(_edges(pairs), iters=5, small_graph_nodes=0).take_all()}
    want = pagerank_local(pairs, iters=5)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_shuffle_tiny_graph_many_blocks():
    from antnre_ray.stages.graph_algos import label_propagation

    # two disjoint triangles — LPA converges to one label per component
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")]
    got = label_propagation(_edges(pairs), small_graph_nodes=0).take_all()
    by_label: dict[int, set] = {}
    for r in got:
        by_label.setdefault(r["label"], set()).add(r["node"])
    assert sorted(map(sorted, by_label.values())) == [["a", "b", "c"], ["x", "y", "z"]]


@pytest.mark.usefixtures("ray_session")
def test_kcore_shuffle_tiny_graph_many_blocks():
    from antnre_ray.stages.graph_algos import kcore

    # K4 clique plus a pendant: 2-core == the clique
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    got = sorted(r["node"] for r in kcore(_edges(pairs), k=2, small_graph_nodes=0).take_all())
    assert got == ["a", "b", "c", "d"]


@pytest.mark.usefixtures("ray_session")
def test_connected_components_shuffle_tiny_graph_many_blocks():
    from antnre_ray.stages.graph_algos import connected_components

    pairs = [("a", "b"), ("b", "c"), ("x", "y")]
    got = connected_components(_edges(pairs), small_graph_nodes=0).take_all()
    by_label: dict[int, set] = {}
    for r in got:
        by_label.setdefault(r["label"], set()).add(r["node"])
    assert sorted(map(sorted, by_label.values())) == [["a", "b", "c"], ["x", "y"]]
