"""Dedup / similarity / text-analysis / media tests: recall on planted
duplicates, ANN recall vs brute force, langid + fingerprint sanity,
media plumbing with the gated decoder."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _pairs_to_set(tbl: pa.Table) -> set[tuple[int, int]]:
    d = tbl.to_pydict()
    return set(zip(d["doc_a"], d["doc_b"]))


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def _collect(self, ds):
        import ray

        return pa.concat_tables(ray.get(ds.to_arrow_refs()), promote_options="default")

    def test_minhash_recall_on_planted_dups(self, sf001):
        from antnre_ray.pipelines.extras import (
            DUP_OFFSET,
            dedup_minhash_pairs,
            planted_dup_ids,
        )

        pairs = _pairs_to_set(self._collect(dedup_minhash_pairs(sf001)))
        planted = planted_dup_ids(sf001)
        found = sum(1 for i in planted if (i, i + DUP_OFFSET) in pairs)
        assert found / len(planted) >= 0.9, f"recall {found}/{len(planted)}"

    def test_ngram_jaccard_pairs_are_exact(self, sf001):
        from antnre_ray.functions.minhash import exact_jaccard
        from antnre_ray.pipelines.extras import dedup_ngram_jaccard_pairs, documents_with_dups

        tbl = self._collect(dedup_ngram_jaccard_pairs(sf001))
        docs = {
            r["doc_id"]: r["text"]
            for r in self._collect(documents_with_dups(sf001)).to_pylist()
        }
        assert tbl.num_rows > 0
        for r in tbl.to_pylist()[:20]:
            j = exact_jaccard(docs[r["doc_a"]], docs[r["doc_b"]])
            assert abs(j - r["jaccard"]) < 1e-12 and j >= 0.5

    def test_simhash_finds_near_identical_docs(self):
        """SimHash's regime is near-identical text (hamming ≤ 3): one
        word changed in a long doc. The planted word-swap corpus is a
        heavier edit class, covered by the minhash/jaccard tests."""
        import ray.data

        from antnre_ray.stages.dedup import simhash_dedup_pairs

        vocab = (
            "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu red green blue yellow "
            "purple orange cyan magenta iron gold silver copper tin lead"
        ).split()
        rng = np.random.default_rng(0)
        rows = []
        for i in range(30):
            # each doc draws its own word sequence → docs are dissimilar
            text = " ".join(rng.choice(vocab, size=60))
            rows.append({"doc_id": i, "text": text})
            if i < 10:  # near-identical twin: one word changed
                rows.append({"doc_id": 1000 + i, "text": text.replace(text.split()[5], "QQQX", 1)})
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        pairs = _pairs_to_set(self._collect(simhash_dedup_pairs(ds, max_hamming=3)))
        found = sum(1 for i in range(10) if (i, 1000 + i) in pairs)
        assert found >= 9, f"simhash near-identical recall {found}/10"
        # No cross-doc false positives between docs with different markers.
        false = [(a, b) for (a, b) in pairs if b != a + 1000]
        assert not false, false[:5]

    def test_simhash_query_runs_on_planted_corpus(self, sf001):
        from antnre_ray.pipelines.extras import dedup_simhash_pairs

        tbl = self._collect(dedup_simhash_pairs(sf001))
        assert set(tbl.column_names) == {"doc_a", "doc_b", "hamming"}
        assert all(h <= 6 for h in tbl.column("hamming").to_pylist())

    def test_embedding_dedup_finds_noised_copies(self, sf001):
        from antnre_ray.pipelines.extras import DUP_OFFSET, dedup_embedding_pairs

        pairs = _pairs_to_set(self._collect(dedup_embedding_pairs(sf001)))
        assert pairs, "no embedding near-dups found"
        frac_planted = sum(1 for a, b in pairs if b == a + DUP_OFFSET) / len(pairs)
        assert frac_planted >= 0.9

    def test_clean_corpus_removes_exactly_the_drop_list(self, sf001):
        from antnre_ray.pipelines.extras import (
            dedup_clean_corpus,
            dedup_drop_list,
            documents_with_dups,
        )

        clean = self._collect(dedup_clean_corpus(sf001))
        docs = self._collect(documents_with_dups(sf001))
        drops = set(self._collect(dedup_drop_list(sf001)).column("doc_id").to_pylist())
        assert clean.num_rows == docs.num_rows - len(drops)
        kept = set(clean.column("doc_id").to_pylist())
        assert not (kept & drops)

    def test_semantic_dedup_prunes_planted_twins(self, sf001):
        from antnre_ray.pipelines.extras import DUP_OFFSET, dedup_semantic, _embeddings_with_dups

        tbl = self._collect(dedup_semantic(sf001))
        n_in = _embeddings_with_dups(sf001).count()
        assert tbl.num_rows == n_in  # one decision row per vector
        d = tbl.to_pydict()
        keep = dict(zip(d["vec_id"], d["keep"]))
        cluster = dict(zip(d["vec_id"], d["cluster"]))
        twins = [(v, v + DUP_OFFSET) for v in keep if v + DUP_OFFSET in keep]
        assert twins, "no planted twins present"
        # A 0.01-noised copy of a unit vector has cosine ~0.999 >> 0.98:
        # whenever both land in one cluster, exactly one member survives.
        co = [(a, b) for a, b in twins if cluster[a] == cluster[b]]
        assert len(co) >= 0.9 * len(twins)  # k-means puts twins together
        assert all(keep[a] + keep[b] == 1 for a, b in co)

    def test_semantic_dedup_keeps_orthogonal_vectors(self, ray_session):
        import ray

        from antnre_ray.stages.dedup import semantic_dedup

        X = np.eye(8, 64, dtype=np.float32)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(8), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
                }
            )
        )
        tbl = self._collect(semantic_dedup(ds, n_clusters=4, threshold=0.9))
        assert tbl.num_rows == 8
        assert all(tbl.column("keep").to_pylist())

    def test_semantic_dedup_partition_invariant(self, sf001):
        from antnre_ray.pipelines.extras import _embeddings_with_dups
        from antnre_ray.stages.dedup import semantic_dedup

        def run(ds):
            t = self._collect(semantic_dedup(ds, n_clusters=16, threshold=0.98))
            return t.sort_by("vec_id")

        a = run(_embeddings_with_dups(sf001))
        b = run(_embeddings_with_dups(sf001).repartition(7))
        assert a.equals(b)

    def test_drop_list_is_distinct_higher_ids(self, sf001):
        from antnre_ray.pipelines.extras import dedup_drop_list, dedup_minhash_pairs

        drops = self._collect(dedup_drop_list(sf001)).column("doc_id").to_pylist()
        assert len(drops) == len(set(drops))
        pairs = self._collect(dedup_minhash_pairs(sf001))
        expected = set(pairs.column("doc_b").to_pylist())
        # exactly the distinct higher-id member of each pair (the base
        # corpus contains some genuine near-dups too, so ids < DUP_OFFSET
        # can legitimately appear)
        assert set(drops) == expected


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_recall_vs_brute_force_clustered():
    """Recall on CLUSTERED embeddings (ANN's design regime — the driver's
    random vectors have no structure for LSH to exploit)."""
    import ray.data

    from antnre_ray.stages.similarity import ann_lsh_topk, brute_force_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 64))
    X = np.repeat(centers, 40, axis=0) + 0.25 * rng.standard_normal((800, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(800), pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    qids = [0, 40, 80, 120, 160]
    Q = X[qids]
    approx = ann_lsh_topk(ds, Q, qids, k=5)
    exact = brute_force_topk(ds, Q, qids, k=5)

    def keyset(t):
        d = t.to_pydict()
        return set(zip(d["query_id"], d["neighbor_id"]))

    recall = len(keyset(approx) & keyset(exact)) / len(keyset(exact))
    assert recall >= 0.8, f"ANN recall {recall}"


@pytest.mark.usefixtures("ray_session")
def test_ann_lsh_runs_on_driver_embeddings(sf001):
    from antnre_ray.pipelines.extras import sim_ann_lsh

    out = sim_ann_lsh(sf001)
    assert set(out.column_names) == {"query_id", "neighbor_id", "rank"}


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_recall_vs_brute_force_clustered(tmp_path):
    """IVF recall on clustered embeddings (same fixture regime as the
    LSH test): with nprobe=8 of 64 lists the probed lists must contain
    ≥80% of the true top-5. Also checks build idempotence."""
    import os

    import ray.data

    from antnre_ray.stages.similarity import (
        brute_force_topk,
        build_ivf_index,
        query_ivf_index,
    )

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 64))
    X = np.repeat(centers, 40, axis=0) + 0.25 * rng.standard_normal((800, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(800), pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx)
    qids = [0, 40, 80, 120, 160]
    Q = X[qids]
    approx = query_ivf_index(idx, Q, qids, k=5, nprobe=8)
    exact = brute_force_topk(ds, Q, qids, k=5)

    def keyset(t):
        d = t.to_pydict()
        return set(zip(d["query_id"], d["neighbor_id"]))

    recall = len(keyset(approx) & keyset(exact)) / len(keyset(exact))
    assert recall >= 0.8, f"IVF recall {recall}"
    mtime = os.path.getmtime(os.path.join(idx, "_manifest.json"))
    build_ivf_index(ds, idx)
    assert os.path.getmtime(os.path.join(idx, "_manifest.json")) == mtime


@pytest.mark.usefixtures("ray_session")
def test_persisted_ann_index_matches_scan_plan(sf001, tmp_path):
    """The bucket-partitioned index must return the SAME top-k as the
    scan-based plan (same planes/seed → same candidates, raw-float32
    storage → bit-identical scores), and rebuilds must be skipped."""
    import os

    import ray.data

    from antnre_ray.pipelines.extras import _ann_queries
    from antnre_ray.stages.similarity import ann_lsh_topk, build_ann_index, query_ann_index

    ds = ray.data.read_parquet(f"{sf001}/embeddings.parquet", columns=["vec_id", "embedding"])
    Q, qids = _ann_queries(sf001)
    idx = str(tmp_path / "annidx")
    build_ann_index(ds, idx)
    assert os.path.exists(os.path.join(idx, "_manifest.json"))
    indexed = query_ann_index(idx, Q, qids, k=5)
    scanned = ann_lsh_topk(ds, Q, qids, k=5)

    def rows(t):
        return sorted(t.to_pylist(), key=lambda r: (r["query_id"], r["rank"]))

    assert rows(indexed) == rows(scanned)
    # Idempotent rebuild: the marker short-circuits (no second write).
    mtime = os.path.getmtime(os.path.join(idx, "_manifest.json"))
    build_ann_index(ds, idx)
    assert os.path.getmtime(os.path.join(idx, "_manifest.json")) == mtime


def test_langid_on_multilingual_samples():
    from antnre_ray.functions.textstats import detect_language

    assert detect_language("the cat sat on the mat and it was happy")[0] == "en"
    assert detect_language("der hund und die katze sind nicht mit dem mann")[0] == "de"
    assert detect_language("le chat est dans la maison avec un chien et pour vous")[0] == "fr"
    assert detect_language("el perro y el gato es una historia para los amigos")[0] == "es"
    assert detect_language("zzz qqq xxx")[0] == "und"
    assert detect_language("")[0] == "und"


def test_winnow_fingerprint_properties():
    from antnre_ray.functions.textstats import winnow_fingerprint

    a = winnow_fingerprint("the quick brown fox jumps over the lazy dog " * 5)
    b = winnow_fingerprint("PREFIX added. " + "the quick brown fox jumps over the lazy dog " * 5)
    assert a and b
    shared = len(set(a) & set(b)) / len(set(a))
    assert shared >= 0.7, f"fingerprints not position-robust: {shared}"
    assert winnow_fingerprint("") == []
    assert winnow_fingerprint("short") == []


def test_simhash_similarity_gradient():
    from antnre_ray.functions.minhash import hamming64, simhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    variant = base.replace("gamma", "GAMMA2", 1)
    different = "completely unrelated words about cooking pasta tonight"
    sigs = simhash_signatures([base, variant, different])
    near = hamming64(sigs[0:1], sigs[1:2])[0]
    far = hamming64(sigs[0:1], sigs[2:3])[0]
    assert near < far


@pytest.mark.usefixtures("ray_session")
def test_media_plumbing(sf001):
    import ray

    from antnre_ray.pipelines.extras import media_features_query, media_refs_query
    from antnre_ray.stages.media import MediaFeatureActor

    refs = pa.concat_tables(ray.get(media_refs_query(sf001).to_arrow_refs()))
    assert refs.num_rows > 0
    assert set(refs.column("kind").to_pylist()) <= {"image", "audio", "video"}
    feats = pa.concat_tables(ray.get(media_features_query(sf001).to_arrow_refs()))
    assert feats.num_rows == refs.num_rows
    r = feats.to_pylist()[0]
    assert r["width"] > 0 and len(r["feature"]) == 8
    # Deterministic decode: same ref → same feature.
    actor = MediaFeatureActor()
    w1, h1, f1 = actor._decode_fake("image", "media://img/x")
    w2, h2, f2 = actor._decode_fake("image", "media://img/x")
    assert (w1, h1) == (w2, h2) and np.array_equal(f1, f2)
    # Gated real decoder raises clearly.
    with pytest.raises(NotImplementedError):
        MediaFeatureActor(decoder="pil")


@pytest.mark.usefixtures("ray_session")
def test_media_frames_query_on_derived_corpus(sf001):
    import ray

    from antnre_ray.pipelines.extras import media_frames_query

    frames = pa.concat_tables(ray.get(media_frames_query(sf001).to_arrow_refs()))
    assert frames.num_rows > 0
    refs = frames.column("media_ref").to_pylist()
    assert all(r.startswith("media://vid/") for r in refs)
    again = pa.concat_tables(ray.get(media_frames_query(sf001).to_arrow_refs()))
    assert sorted(frames.to_pylist(), key=str) == sorted(again.to_pylist(), key=str)


def test_media_video_frame_sampling():
    from antnre_ray.stages.media import MediaFeatureActor, frame_sample_batch

    actor = MediaFeatureActor()
    batch = pa.table(
        {
            "doc_id": pa.array(["d1", "d1", "d2"]),
            "span_idx": pa.array([0, 1, 0], pa.int32()),
            "kind": pa.array(["video", "image", "video"]),
            "media_ref": pa.array(["media://vid/a", "media://img/b", "media://vid/c"]),
        }
    )
    feats = actor(batch)
    vid = feats.filter(pa.compute.equal(feats.column("kind"), "video"))
    assert all(w >= 24 for w in vid.column("width").to_pylist())
    frames = frame_sample_batch(feats, every_n=24, max_frames=4)
    assert frames.num_rows > 0
    assert set(frames.column("media_ref").to_pylist()) <= {"media://vid/a", "media://vid/c"}
    # deterministic: same input → same frames/features
    again = frame_sample_batch(feats, every_n=24, max_frames=4)
    assert frames.equals(again)


def test_io_facade_roundtrip(tmp_path):
    import ray
    import ray.data

    from antnre_ray.sources.io import HAVE_LANCE, read_table, write_table

    assert not HAVE_LANCE  # sandbox: parquet fallback is the tested path
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["x", "y", "z"])})
    ds = ray.data.from_arrow(t)
    path = str(tmp_path / "t")
    write_table(ds, path)
    back = pa.concat_tables(ray.get(read_table(path).to_arrow_refs()), promote_options="default")
    assert sorted(back.to_pylist(), key=str) == sorted(t.to_pylist(), key=str)
    # column pruning at the read
    only_a = pa.concat_tables(ray.get(read_table(path, columns=["a"]).to_arrow_refs()))
    assert only_a.column_names == ["a"]


def test_io_facade_jsonl_csv(tmp_path):
    """Ingest formats: JSONL and CSV route through the same facade
    (post-parse projection — these are arrival formats, not scale
    paths)."""
    import ray

    from antnre_ray.sources.io import read_table, write_table

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["x", "y", "z"])})
    ds = ray.data.from_arrow(t)
    for ext in ("jsonl", "csv"):
        path = str(tmp_path / f"t_{ext}.{ext}")
        write_table(ds, path)
        back = pa.concat_tables(
            ray.get(read_table(path).to_arrow_refs()), promote_options="default"
        )
        assert sorted(back.to_pylist(), key=str) == sorted(t.to_pylist(), key=str), ext
        # post-parse projection; select_columns is skipped on empty
        # blocks (they keep the pre-projection schema), so drop them
        # like relational._collect does
        only_a = pa.concat_tables(
            [tb for tb in ray.get(read_table(path, columns=["a"]).to_arrow_refs()) if tb.num_rows]
        )
        assert only_a.column_names == ["a"], ext
        assert only_a.num_rows == 3, ext
    # TSV: delimiter inferred from the extension
    import pyarrow.csv as pacsv

    tsv = tmp_path / "t.tsv"
    pacsv.write_csv(t, str(tsv), write_options=pacsv.WriteOptions(delimiter="\t"))
    back = pa.concat_tables(
        ray.get(read_table(str(tsv)).to_arrow_refs()), promote_options="default"
    )
    assert sorted(back.to_pylist(), key=str) == sorted(t.to_pylist(), key=str)


@pytest.mark.usefixtures("ray_session")
def test_shared_passages_recall_and_boilerplate_bound(sf001):
    """Planted mutated twins must surface as shared-passage pairs
    (recall >= 0.95), and the max_df boilerplate cutoff must keep the
    pair output far below corpus-quadratic on this templated corpus."""
    from antnre_ray.pipelines.extras import (
        DUP_OFFSET,
        documents_with_dups,
        planted_dup_ids,
    )
    from antnre_ray.stages.analyze import shared_passages

    tbl = shared_passages(documents_with_dups(sf001), min_shared=3).to_pandas()
    pairs = set(zip(tbl["doc_a"], tbl["doc_b"]))
    planted = planted_dup_ids(sf001)
    found = sum(1 for i in planted if (i, i + DUP_OFFSET) in pairs)
    assert found / len(planted) >= 0.95, f"recall {found}/{len(planted)}"
    # ~660 docs -> ~220k unordered pairs; df-capped output must be a
    # small fraction of that or the operator degenerated to all-pairs.
    n_docs = 664 * 2  # base + planted upper bound
    assert len(tbl) < 0.2 * n_docs * (n_docs - 1) / 2


@pytest.mark.usefixtures("ray_session")
def test_quarantine_report_catches_planted_violations(sf001):
    """The A2 row-quarantine sink: planted malformed rows come back as
    (doc_id, reason) rows covering all three violation classes, and the
    clean stream continues (no SchemaError)."""
    from antnre_ray.pipelines.registry import load_all

    q = load_all()
    tbl = q["quarantine_report"][0](sf001).to_pandas()
    assert len(tbl) > 0
    reasons = set(tbl["reason"])
    assert reasons <= {"null_doc_id", "null_text_span", "decreasing_offsets"}
    assert "null_doc_id" in reasons and "null_text_span" in reasons
    # Deterministic planting: a second run returns the identical report.
    tbl2 = q["quarantine_report"][0](sf001).to_pandas()
    key = lambda t: sorted(zip(t["doc_id"].fillna(""), t["reason"]))  # noqa: E731
    assert key(tbl) == key(tbl2)


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_eval_source_docs(sf001):
    """Every doc whose text seeded the eval set must come back
    contaminated (it shares all its own 13-grams); unrelated docs may
    legitimately collide on templated corpora but stay a minority."""
    from antnre_ray.functions.hashing import stable_u64
    from antnre_ray.pipelines.registry import load_all

    q = load_all()
    tbl = q["text_decontaminate"][0](sf001).to_pandas()
    eval_ids = {i for i in tbl["doc_id"] if stable_u64(f"eval|{i}") % 37 == 0}
    assert eval_ids, "fixture must select a nonempty eval set"
    flagged = set(tbl[tbl["contaminated"]]["doc_id"])
    assert eval_ids <= flagged, eval_ids - flagged
    assert len(flagged) < 0.9 * len(tbl), "decontamination flagged ~everything"
    # hits are exact n-gram counts, so eval docs have >= 1
    assert (tbl.set_index("doc_id").loc[sorted(eval_ids)]["n_hits"] >= 1).all()


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_match_union_find(sf001):
    """Cluster assignment == driver-side union-find over the same pair
    list (transitive closure), and every planted twin shares its
    source's cluster."""
    from antnre_ray.pipelines.extras import _minhash_pairs
    from antnre_ray.pipelines.registry import load_all

    q = load_all()
    got = q["dedup_clusters"][0](sf001).to_pandas()
    pairs = _minhash_pairs(sf001).to_pandas()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        parent[find(a)] = find(b)
    want_groups: dict[int, set] = {}
    for x in list(parent):
        want_groups.setdefault(find(x), set()).add(x)
    got_groups: dict[int, set] = {}
    for d, c in zip(got["doc_id"], got["cluster"]):
        got_groups.setdefault(c, set()).add(d)
    assert sorted(map(sorted, want_groups.values())) == sorted(map(sorted, got_groups.values()))


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_shared_bucket_all_new_docs(tmp_path):
    """When TWO new docs land in the same (band, key) bucket, BOTH must
    pair with the matching corpus doc — regression for the index_in
    mapping that only ever returned the FIRST probe position, silently
    admitting every later same-bucket new doc as 'novel'."""
    import ray

    from antnre_ray.stages.dedup import build_minhash_index, query_minhash_index

    text = "the quick brown fox jumps over the lazy dog " * 5
    base = ray.data.from_arrow(pa.table({"doc_id": [9], "text": [text]}))
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(base, idx)
    new = pa.table({"doc_id": [1, 2], "text": [text, text]})
    got = query_minhash_index(idx, new, threshold=0.5)
    pairs = set(zip(got.column("doc_a").to_pylist(), got.column("doc_b").to_pylist()))
    assert pairs == {(1, 9), (2, 9)}, pairs


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_finds_planted_sources(sf001):
    """Every planted mutated twin (the 'new ingest batch') must match
    its base-corpus source through the persisted index, and a second
    call must reuse the index (idempotent build) with identical pairs."""
    from antnre_ray.pipelines.extras import (
        DUP_OFFSET,
        dedup_incremental,
        planted_dup_ids,
    )

    t1 = dedup_incremental(sf001)
    pairs = set(zip(t1.column("doc_a").to_pylist(), t1.column("doc_b").to_pylist()))
    planted = planted_dup_ids(sf001)
    found = sum(1 for i in planted if (i + DUP_OFFSET, i) in pairs)
    assert found / len(planted) >= 0.9, f"recall {found}/{len(planted)}"
    t2 = dedup_incremental(sf001)
    pairs2 = set(zip(t2.column("doc_a").to_pylist(), t2.column("doc_b").to_pylist()))
    assert pairs == pairs2


def test_approx_quantile_sketch_accuracy(ray_session, sf001):
    """Merged-sketch quantiles within 2% RELATIVE rank error of exact
    (the sketch bounds rank error; translate via the local density)."""
    import numpy as np
    import pyarrow.parquet as pq

    from antnre_ray.functions.sketch import (
        quantile_merge,
        quantile_partial,
        quantile_query,
    )

    vals = (
        pq.read_table(f"{sf001}/lineitem.parquet", columns=["l_extendedprice"])
        .column("l_extendedprice")
        .to_numpy(zero_copy_only=False)
    )
    rng = np.random.default_rng(0)
    order = rng.permutation(len(vals))
    chunks = np.array_split(vals[order], 13)
    merged = quantile_merge([quantile_partial(c) for c in chunks])
    svals = np.sort(vals)
    for q in (0.5, 0.9, 0.99):
        est = quantile_query(merged, q)
        # rank of the estimate vs the target rank
        rank = np.searchsorted(svals, est) / len(svals)
        assert abs(rank - q) < 0.02, (q, est, rank)


def test_quantile_sketch_merge_weight_exact(ray_session):
    import numpy as np

    from antnre_ray.functions.sketch import quantile_merge, quantile_partial

    a = np.arange(10_000, dtype=np.float64)
    parts = [quantile_partial(c) for c in np.array_split(a, 7)]
    merged = quantile_merge(parts)
    assert abs(merged[:, 1].sum() - 10_000) < 1e-6


def test_repetition_filter_flags_planted_docs(ray_session):
    import pyarrow as pa

    import ray.data
    from antnre_ray.stages.analyze import repetition_filter

    rows = [
        {"doc_id": 1, "text": "a perfectly normal sentence with varied words here"},
        {"doc_id": 2, "text": "spam spam spam spam spam spam spam spam spam spam"},
        {"doc_id": 3, "text": "line one\nline two\nline one\nline two\nline one"},
        {"doc_id": 4, "text": "buy now " * 30},
        {"doc_id": 5, "text": ""},
    ]
    out = pa.Table.from_pylist(
        repetition_filter(ray.data.from_arrow(pa.Table.from_pylist(rows))).take_all()
    ).to_pandas().set_index("doc_id").sort_index()
    assert not out.loc[1].flagged
    assert out.loc[2].flagged  # token run
    assert out.loc[3].flagged  # duplicate lines
    assert out.loc[4].flagged  # dominant 2-gram
    assert not out.loc[5].flagged  # empty is not "repetitive"


def test_grouped_approx_quantiles_accuracy(ray_session, sf001):
    """b15e sketch quantiles within 2.5% rank error of exact per group."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from antnre_ray.pipelines.relational import b15e_grouped_approx_quantiles

    got = pa.Table.from_pylist(
        b15e_grouped_approx_quantiles(sf001).take_all()
    ).to_pandas().set_index("l_returnflag")
    tbl = pq.read_table(
        f"{sf001}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pandas()
    for flag, grp in tbl.groupby("l_returnflag"):
        vals = np.sort(grp.l_extendedprice.values)
        for q, col in ((0.5, "p50_price"), (0.9, "p90_price")):
            est = got.loc[flag, col]
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.025, (flag, q, est, rank)


def test_heavy_hitters_bound_and_coverage(ray_session, sf001):
    """b41 MG estimates never exceed truth, underestimate within the
    n/(k+1) bound, and every guaranteed-frequent item is reported."""
    import numpy as np
    import pyarrow.parquet as pq

    from antnre_ray.pipelines.relational import b41_heavy_hitters

    got = b41_heavy_hitters(sf001).to_pandas()
    keys = pq.read_table(
        f"{sf001}/lineitem.parquet", columns=["l_partkey"]
    ).column("l_partkey").to_numpy()
    vals, cnts = np.unique(keys, return_counts=True)
    true = dict(zip(vals.tolist(), cnts.tolist()))
    n = len(keys)
    bound = got.max_underestimate.iloc[0]
    assert bound >= n // 65  # k=64
    for row in got.itertuples():
        t = true[row.l_partkey]
        assert row.est_count <= t, (row.l_partkey, row.est_count, t)
        assert t - row.est_count <= bound
    hot = {v for v, c in true.items() if c > bound}
    assert hot <= set(got.l_partkey), hot - set(got.l_partkey)


def test_grouped_hll_accuracy(ray_session, sf001):
    """b18c per-group HLL within 5% of exact distinct counts."""
    import pyarrow.parquet as pq

    from antnre_ray.pipelines.relational import b18c_grouped_hll

    got = b18c_grouped_hll(sf001).to_pandas().set_index("o_orderstatus")
    tbl = pq.read_table(
        f"{sf001}/orders.parquet", columns=["o_orderstatus", "o_custkey"]
    ).to_pandas()
    for status, grp in tbl.groupby("o_orderstatus"):
        exact = grp.o_custkey.nunique()
        est = got.loc[status, "approx_distinct_custkeys"]
        assert abs(est - exact) / exact < 0.05, (status, est, exact)


def test_tfidf_keywords_rank_planted_term(ray_session):
    """A rare repeated term outranks corpus-wide stopwords."""
    import pyarrow as pa
    import ray.data

    from antnre_ray.stages.analyze import tfidf_keywords

    common = "the quick brown fox jumps over the lazy dog"
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array(
                [f"{common} zebra zebra zebra" if i == 7 else common for i in range(20)]
            ),
        }
    )
    out = tfidf_keywords(ray.data.from_arrow(docs), top_k=2).to_pandas()
    top = out[(out.doc_id == 7) & (out["rank"] == 1)].term.iloc[0]
    assert top == "zebra", out[out.doc_id == 7]
    # docs without the planted term must not surface it
    assert "zebra" not in set(out[out.doc_id != 7].term)


def test_edit_le1_matches_brute_force_dp():
    """The b46 verifier vs a textbook Levenshtein DP, including the
    indel cases the supplier fixture never produces."""
    import numpy as np

    from antnre_ray.pipelines.relational import _edit_le1

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cases = [
        ("abc", "abc"), ("abc", "abd"), ("abc", "xbc"), ("abc", "axc"),
        ("abc", "ab"), ("ab", "abc"), ("abc", "bc"), ("abc", "ac"),
        ("abc", "abcd"), ("abcd", "abc"), ("abc", "xyz"), ("abc", "acb"),
        ("", "a"), ("a", ""), ("a", "a"), ("aa", "aba"), ("aba", "aa"),
        ("kitten", "sitten"), ("kitten", "kittn"), ("kitten", "sitting"),
    ]
    a = np.asarray([x for x, _ in cases], dtype=object)
    b = np.asarray([y for _, y in cases], dtype=object)
    got = _edit_le1(a, b)
    want = np.array([lev(x, y) <= 1 for x, y in cases])
    assert (got == want).all(), list(zip(cases, got, want))


def test_edit_distance_join_blocking_recall_on_indels(ray_session):
    """PassJoin blocking must surface INSERT/DELETE matches (length ±1)
    too, not just the substitutions the supplier fixture plants: run the
    full distributed join over a hand-built corpus with planted indels
    and compare the pair set against brute-force Levenshtein."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data

    from antnre_ray.pipelines.relational import edit_distance_join

    clean = ["alpha-node-01", "beta-node-02", "gamma-node-03", "delta-node-04",
             "a", "xy", ""]
    # deletion, insertion, substitution, unrelated, exact copy, and the
    # short-string class (len <= k): single-char swap, len-1/len-2
    # cross-matches, empty vs single char
    dirty = ["alpha-node-1", "beta-nodeX-02", "gamma-node-93", "zzzz",
             "delta-node-04", "b", "ab", "x"]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (i, j)
        for i, c in enumerate(clean)
        for j, d in enumerate(dirty)
        if lev(c, d) <= 1
    }
    assert len(want) >= 8  # del, ins, sub, exact, and short-class pairs

    build = ray.data.from_arrow(
        pa.table({"rid": pa.array(range(len(clean)), pa.int64()), "name": pa.array(clean)})
    )
    probe = ray.data.from_arrow(
        pa.table({"rid": pa.array(range(len(dirty)), pa.int64()), "name": pa.array(dirty)})
    )
    out = edit_distance_join(build, probe)
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_columns > 0],
        promote_options="default",
    )
    got = set(
        zip(tbl.column("s_suppkey").to_pylist(), tbl.column("c_key").to_pylist())
    )
    assert got == want


def test_max_concurrency_tie_semantics(ray_session, tmp_path):
    """Sweep-line tie handling: ends must apply before starts at the
    same instant (half-open intervals), including the case where an
    interval's end coincides exactly with another's start — brute-force
    reference over a dense planted timeline."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from antnre_ray.pipelines.relational import b47_max_concurrency

    dur = 1_800_000_000
    hour = 3_600_000_000
    base = 400 * hour
    # ends colliding with starts: events at t and exactly t+30min;
    # plus bursts of identical timestamps
    starts = np.array(
        [base, base, base, base + dur, base + dur, base + 2 * dur, base + hour * 5]
        + [base + hour * 2] * 10,
        dtype=np.int64,
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array(starts.astype("datetime64[us]"), pa.timestamp("us"))}),
        sf / "events.parquet",
    )
    out = b47_max_concurrency(str(sf))
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_columns > 0],
        promote_options="default",
    )
    got = dict(
        zip(
            pa.Array.to_numpy(
                tbl.column("hour_ts").combine_chunks(), zero_copy_only=False
            ).astype("int64"),
            tbl.column("max_concurrent").to_pylist(),
        )
    )

    # brute force: running sum over boundaries sorted by (t, d)
    bts = np.concatenate([starts, starts + dur])
    bd = np.concatenate([np.ones(len(starts), np.int64), -np.ones(len(starts), np.int64)])
    o = np.lexsort((bd, bts))
    bts, bd = bts[o], bd[o]
    conc = np.cumsum(bd)
    want: dict[int, int] = {}
    for t, c in zip(bts, conc):
        h = (t // hour) * hour
        want[h] = max(want.get(h, -(10**9)), int(c))
    assert got == want


def test_lm_perplexity_flags_gibberish(ray_session):
    """The unigram-LM gate must score an out-of-distribution gibberish
    doc above every natural-ish doc, and be deterministic across input
    partitionings (the model is a pure function of corpus counts)."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data

    from antnre_ray.stages.analyze import lm_perplexity

    rng_words = ["the", "cat", "sat", "on", "a", "mat", "and", "dogs", "ran", "far"]
    natural = [
        " ".join(rng_words[(i + j) % len(rng_words)] for j in range(60)) for i in range(40)
    ]
    gibberish = " ".join(f"zq{i}xv{i * 7}" for i in range(60))
    docs = pa.table(
        {
            "doc_id": pa.array(range(41), pa.int64()),
            "text": pa.array(natural + [gibberish], pa.string()),
        }
    )

    def run(nblocks: int) -> dict[int, float]:
        ds = ray.data.from_arrow(docs).repartition(nblocks)
        out = lm_perplexity(ds)
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_columns > 0],
            promote_options="default",
        )
        return dict(zip(t.column("doc_id").to_pylist(), t.column("perplexity").to_pylist()))

    p2 = run(2)
    assert len(p2) == 41
    gib = p2[40]
    assert all(gib > v for k, v in p2.items() if k != 40), (gib, max(v for k, v in p2.items() if k != 40))
    p8 = run(8)
    assert p2 == p8  # partition-count invariance, bit-exact


def test_triangle_count_matches_brute_force(ray_session):
    """Degree-ordered wedge join vs a set-intersection reference, over
    graphs that exercise hubs, shared edges, duplicates/reverses/self-
    loops, and a random graph."""
    import collections
    import random

    import pyarrow as pa

    import ray.data

    from antnre_ray.stages.graph_algos import triangle_count

    def ref(pairs):
        adj = collections.defaultdict(set)
        for u, v in pairs:
            if u != v:
                adj[u].add(v)
                adj[v].add(u)
        return sum(
            len(adj[u] & adj[v] & {x for x in adj if x > v})
            for u in adj
            for v in adj[u]
            if v > u
        )

    random.seed(7)
    nodes = [f"r{i}" for i in range(60)]
    cases = [
        [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)],  # K5 -> 10
        [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)],  # cycle -> 0
        [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a"), ("c", "a")],
        [("h", f"s{i}") for i in range(20)] + [("s0", "s1"), ("s1", "s2")],
        [tuple(random.sample(nodes, 2)) for _ in range(300)],
    ]
    for pairs in cases:
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs]),
                    "dst": pa.array([p[1] for p in pairs]),
                }
            )
        ).repartition(3)
        assert triangle_count(ds) == ref(pairs)


def test_count_min_bounds_and_merge(ray_session, sf001):
    """CM guarantees: est >= true always; est <= true + (e/W)*N with
    overwhelming probability at this scale; merged grid equals the
    single-pass grid (counter addition is order-independent)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from antnre_ray.functions.sketch import CM_W, cm_merge, cm_partial, cm_query
    from antnre_ray.pipelines.relational import b50_count_min

    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"SELECT o_custkey, count(*) FROM read_parquet('{sf001}/orders.parquet') "
            f"WHERE o_custkey BETWEEN 1 AND 20 GROUP BY 1"
        ).fetchall()
    )
    n_total = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf001}/orders.parquet')"
    ).fetchone()[0]
    out = b50_count_min(sf001)
    eps_n = (np.e / CM_W) * n_total + 1
    for k, est in zip(out.column("o_custkey").to_pylist(), out.column("est_orders").to_pylist()):
        true = truth.get(k, 0)
        assert est >= true, (k, est, true)
        assert est <= true + eps_n, (k, est, true, eps_n)

    # merge == single pass
    vals = pa.array([str(i % 50) for i in range(1000)])
    whole = cm_partial(vals)
    halves = cm_merge([cm_partial(vals.slice(0, 400)), cm_partial(vals.slice(400))])
    assert (whole == halves).all()
    assert (cm_query(whole, pa.array(["7"]))[0]) == 20  # 1000/50 exact here


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_index_recall_and_compression(tmp_path):
    """IVF-PQ on the clustered fixture: ADC top-5 must recover >=70% of
    the true top-5 (quantized scores lose a little recall vs raw-vector
    IVF's 0.8 bar — that is the compression trade), the stored codes
    must actually BE 8 bytes per vector, and the build is idempotent."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from antnre_ray.stages.similarity import (
        PQ_M,
        brute_force_topk,
        build_ivfpq_index,
        query_ivfpq_index,
    )

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 64))
    X = np.repeat(centers, 40, axis=0) + 0.25 * rng.standard_normal((800, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(800), pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(ds, idx)

    qids = [0, 40, 80, 120, 160]
    Q = X[qids]
    exact = brute_force_topk(ds, Q, qids, k=5)

    def keyset(t):
        d = t.to_pydict()
        return set(zip(d["query_id"], d["neighbor_id"]))

    # The PQ contract is recall@R (true top-k inside the ADC top-R):
    # 8-byte codes rank clusters but cannot resolve near-ties inside
    # one, so exact top-5 overlap is the wrong metric (measured ~0.32
    # here while recall@20 is ~0.84 — the Jégou et al. evaluation).
    adc20 = query_ivfpq_index(idx, Q, qids, k=20, nprobe=8)
    recall_at_20 = len(keyset(adc20) & keyset(exact)) / len(keyset(exact))
    assert recall_at_20 >= 0.8, f"IVF-PQ recall@20 {recall_at_20}"

    # Refine (exact re-rank of the ADC candidates) recovers top-5
    # recall equal to recall@20 — the production two-stage shape.
    from antnre_ray.stages.similarity import refine_topk

    refined = refine_topk(ds, adc20, Q, qids, k=5)
    recall_refined = len(keyset(refined) & keyset(exact)) / len(keyset(exact))
    assert recall_refined >= 0.8, f"refined recall {recall_refined}"
    assert recall_refined >= recall_at_20 - 1e-9

    # Compression: codes column is fixed_size_list<uint8>[PQ_M] — 8 bytes
    # per vector where float32[64] is 256. Shards resolve through the
    # committed manifest (no directory-listing assumption).
    from antnre_ray.stages.similarity import _load_manifest

    man = _load_manifest(idx)
    f = os.path.join(idx, man["build"], man["files"][0])
    schema = pq.read_schema(f)
    codes_t = schema.field("codes").type
    assert pa.types.is_fixed_size_list(codes_t) and codes_t.list_size == PQ_M
    assert codes_t.value_type == pa.uint8()
    assert "vec" not in schema.names  # raw vectors never stored

    mtime = os.path.getmtime(os.path.join(idx, "_manifest.json"))
    build_ivfpq_index(ds, idx)
    assert os.path.getmtime(os.path.join(idx, "_manifest.json")) == mtime


def test_dsir_weights_prefer_target_vocabulary(ray_session):
    """DSIR importance weights must rank docs written in the TARGET
    vocabulary above docs from a disjoint vocabulary, and the weights
    must be partition-invariant (counts are exact integers, the ratio a
    pure function of them)."""
    import pyarrow as pa

    import ray
    import ray.data

    from antnre_ray.stages.analyze import dsir_log_weights

    tgt_words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    oth_words = ["krzx", "plomb", "vrqt", "snarf", "glyph", "wubble"]
    target = pa.table(
        {
            "doc_id": pa.array(range(100, 120), pa.int64()),
            "text": pa.array(
                [" ".join(tgt_words[(i + j) % 6] for j in range(40)) for i in range(20)],
                pa.string(),
            ),
        }
    )
    raw = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                [" ".join(tgt_words[(i + j) % 6] for j in range(40)) for i in range(20)]
                + [" ".join(oth_words[(i + j) % 6] for j in range(40)) for i in range(20)],
                pa.string(),
            ),
        }
    )

    def run(nblocks: int) -> dict[int, float]:
        out = dsir_log_weights(
            ray.data.from_arrow(raw).repartition(nblocks),
            ray.data.from_arrow(target),
        )
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_columns > 0],
            promote_options="default",
        )
        return dict(zip(t.column("doc_id").to_pylist(), t.column("log_weight").to_pylist()))

    w = run(2)
    in_tgt = [w[i] for i in range(20)]
    out_tgt = [w[i] for i in range(20, 40)]
    assert min(in_tgt) > max(out_tgt), (min(in_tgt), max(out_tgt))
    assert run(7) == w  # partition-invariant


def test_dsir_select_fraction_and_determinism(ray_session, sf001):
    """The registered query: selected fraction near frac, deterministic
    across runs, and one decision row per input doc."""
    import pyarrow as pa

    import ray

    from antnre_ray.pipelines.extras import data_dsir_select

    def collect(ds):
        return pa.concat_tables(
            ray.get(ds.to_arrow_refs()), promote_options="default"
        ).sort_by("doc_id")

    a = collect(data_dsir_select(sf001))
    b = collect(data_dsir_select(sf001))
    assert a.equals(b)
    n = a.num_rows
    import pyarrow.parquet as pq

    assert n == pq.ParquetFile(f"{sf001}/documents.parquet").metadata.num_rows
    sel = sum(1 for s in a.column("selected").to_pylist() if s)
    assert 0.15 <= sel / n <= 0.35, sel / n  # frac=0.25, quantile estimated


@pytest.mark.usefixtures("ray_session")
def test_ivf_build_sampling_is_partition_invariant(tmp_path):
    """VERDICT r3 #3: index TRAINING must not depend on block layout.
    The bottom-k-by-hash draw replaces Dataset.random_sample (which
    samples per block): building the same corpus at 2 vs 8 input
    blocks must produce bit-identical centroids (IVF) and codebooks
    (IVF-PQ)."""
    import numpy as np
    import os

    import ray.data

    from antnre_ray.stages.similarity import (
        _load_index_array,
        build_ivf_index,
        build_ivfpq_index,
    )

    rng = np.random.default_rng(11)
    X = rng.standard_normal((600, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(600), pa.int64()),
            "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    for builder, arrays in [
        (build_ivf_index, ["centroids.npy"]),
        (build_ivfpq_index, ["centroids.npy", "codebooks.npy"]),
    ]:
        got = {}
        for nblocks in (2, 8):
            ds = ray.data.from_arrow(tbl).repartition(nblocks)
            idx = str(tmp_path / f"{builder.__name__}-{nblocks}")
            builder(ds, idx)
            got[nblocks] = [_load_index_array(idx, a) for a in arrays]
        for a2, a8 in zip(got[2], got[8]):
            np.testing.assert_array_equal(a2, a8)


@pytest.mark.usefixtures("ray_session")
def test_index_build_and_query_through_file_uri(tmp_path):
    """VERDICT r3 #4: the manifest-commit build must round-trip through
    a URI filesystem path (file://…) with NO rename — build AND query
    through the URI, results identical to the local-path build."""
    import numpy as np
    import os

    import ray.data

    from antnre_ray.stages.similarity import (
        _load_manifest,
        build_ivf_index,
        query_ivf_index,
    )

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((10, 64))
    X = np.repeat(centers, 50, axis=0) + 0.2 * rng.standard_normal((500, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(500), pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32).tolist() for r in X], pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    local = str(tmp_path / "ivf-local")
    uri = "file://" + str(tmp_path / "ivf-uri")
    build_ivf_index(ds, local)
    build_ivf_index(ds, uri)
    # committed via manifest, readable through either addressing mode
    assert _load_manifest(local) is not None and _load_manifest(uri) is not None
    assert not os.path.exists(os.path.join(str(tmp_path / "ivf-uri"), "_built"))
    qids = [0, 50, 100]
    Q = X[qids]
    a = query_ivf_index(local, Q, qids, k=5).to_pylist()
    b = query_ivf_index(uri, Q, qids, k=5).to_pylist()
    assert a == b and len(a) > 0
    # idempotence through the manifest: rebuild without overwrite no-ops
    m = _load_manifest(uri)["build"]
    build_ivf_index(ds, uri)
    assert _load_manifest(uri)["build"] == m
    # overwrite: a NEW build id is committed; the superseded build
    # SURVIVES one rebuild (grace period for readers holding the old
    # manifest) and is recorded as manifest["prev"]
    build_ivf_index(ds, uri, overwrite=True)
    man2 = _load_manifest(uri)
    m2 = man2["build"]
    assert m2 != m and man2["prev"] == m
    assert os.path.exists(os.path.join(str(tmp_path / "ivf-uri"), m))
    # queries through the OLD manifest's shard list still resolve
    # (the concurrent-rebuild reader the grace period exists for)
    # ... and the grand-previous is GC'd at the NEXT overwrite commit
    build_ivf_index(ds, uri, overwrite=True)
    man3 = _load_manifest(uri)
    assert man3["build"] != m2 and man3["prev"] == m2
    assert not os.path.exists(os.path.join(str(tmp_path / "ivf-uri"), m))
    assert os.path.exists(os.path.join(str(tmp_path / "ivf-uri"), m2))


@pytest.mark.usefixtures("ray_session")
def test_uncommitted_index_build_is_invisible(tmp_path):
    """Crash-safety of the manifest commit: shard files WITHOUT a
    committed manifest must be invisible to queries, and a later
    successful build must supersede them atomically."""
    import numpy as np
    import os

    import ray.data

    from antnre_ray.stages.similarity import (
        _index_is_built,
        build_ivf_index,
        query_ivf_index,
    )

    rng = np.random.default_rng(9)
    X = rng.standard_normal((300, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(300), pa.int64()),
            "embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    idx = str(tmp_path / "ivf-crash")
    # simulate a crashed build: orphan shard files, no manifest
    os.makedirs(os.path.join(idx, "build-deadbeef", "centroid=c0000"), exist_ok=True)
    with open(os.path.join(idx, "build-deadbeef", "centroid=c0000", "junk.parquet"), "wb") as f:
        f.write(b"not a real parquet")
    assert not _index_is_built(idx)
    # a real build commits and queries work; the orphan junk is never read
    build_ivf_index(ds, idx)
    assert _index_is_built(idx)
    out = query_ivf_index(idx, X[[0, 5]], [0, 5], k=3)
    assert out.num_rows > 0
