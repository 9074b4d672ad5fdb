"""Linking (A16), canonicalization (A17/A18), materialization (A19) tests,
including the head-entity skew fixture (SURVEY.md §5.2 / M3)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from antnre_ray.stages.canonicalize import canonicalize_local, preagg_batch
from antnre_ray.stages.link import LinkerActor, build_linker_state, canonical_id
from antnre_ray.stages.materialize import materialize_local


def _mentions_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "ent_type": pa.array([r[1] for r in rows], pa.string()),
            "surface": pa.array([r[2] for r in rows], pa.string()),
            "entity_id": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_linker_alias_exact_and_variants():
    actor = LinkerActor(build_linker_state())
    eid, score = actor._link_one("alice smith", "Peop")
    assert eid.startswith("e:") and score == 1.0
    # Case/punct variants normalize to the same alias.
    assert actor._link_one("alice smith", "Peop") == (eid, 1.0)
    # Type mismatch falls through to canonical id.
    eid2, s2 = actor._link_one("alice smith", "Org")
    assert eid2 == canonical_id("alice smith", "Org") and s2 == 0.0


def test_linker_knn_near_match_and_miss():
    actor = LinkerActor(build_linker_state(), threshold=0.80)
    # A close typo links through the embedding kNN path.
    eid_exact, _ = actor._link_one("vandelay industries", "Org")
    eid_typo, score = actor._link_one("vandelay industriez", "Org")
    assert eid_typo == eid_exact and 0.80 <= score < 1.0
    # A totally unknown surface gets its canonical fallback id.
    eid_new, s = actor._link_one("zorblax the unpronounceable", "Org")
    assert eid_new == canonical_id("zorblax the unpronounceable", "Org") and s == 0.0


def test_linker_on_nested_extractions(tiny_corpus):
    from antnre_ray.pipelines.flagship import reference_extractions
    from antnre_ray.stages.explode import mentions_batch

    docs, _ = tiny_corpus
    linked = LinkerActor(build_linker_state())(reference_extractions(docs))
    ments = mentions_batch(linked)
    assert {"entity_id", "link_score"} <= set(ments.column_names)
    d = ments.to_pydict()
    # Planted gazetteer surfaces must all link to e: ids with score 1.
    planted = [i for i, s in enumerate(d["surface"]) if s == "berlin"]
    assert planted and all(d["entity_id"][i].startswith("e:") for i in planted)
    assert all(d["link_score"][i] == 1.0 for i in planted)


def test_canonicalize_counts_ties_and_aliases():
    rows = (
        [("d1", "Peop", "Ada Lovelace", "e:x")] * 3
        + [("d2", "Peop", "ada lovelace", "e:x")] * 3  # tie on count → lexicographic
        + [("d3", "Peop", "ADA LOVELACE", "e:x")]
    )
    ents = canonicalize_local(_mentions_table(rows))
    assert ents.num_rows == 1
    r = ents.to_pylist()[0]
    assert r["canonical_form"] == "ADA LOVELACE" or r["canonical_form"] == "Ada Lovelace"
    # tie between "Ada Lovelace"(3) and "ada lovelace"(3): lexicographic min
    assert r["canonical_form"] == "Ada Lovelace"
    assert r["mention_count"] == 7
    assert set(r["aliases"]) == {"Ada Lovelace", "ada lovelace", "ADA LOVELACE"}


def test_canonicalize_salt_independence():
    """A18: result must not depend on the salt fan-out (skew knob)."""
    rows = [("d", "Loc", f"city {i % 5}", f"c:{i % 5}") for i in range(200)]
    a = canonicalize_local(_mentions_table(rows), salt=1).to_pylist()
    b = canonicalize_local(_mentions_table(rows), salt=16).to_pylist()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_preagg_bounds_skewed_key():
    """90%-one-key fixture: the combiner must collapse a head entity to
    ≤ #distinct-surfaces rows per batch, and salts must spread them."""
    rows = [("d", "Peop", f"The Head {i % 3}", "e:head") for i in range(900)]
    rows += [("d", "Peop", f"tail {i}", f"c:{i}") for i in range(100)]
    pre = preagg_batch(_mentions_table(rows), salt=8)
    head = pre.filter(pa.compute.equal(pre.column("entity_id"), "e:head"))
    assert head.num_rows == 3  # 900 mentions → 3 combiner rows
    assert pre.num_rows == 103
    salts = set(head.column("salt").to_pylist())
    assert len(salts) >= 2  # different surfaces hash to different reducers


def test_materialize_aggregates_and_sorts():
    def trip(doc, s_eid, pred, o_eid):
        return {
            "doc_id": doc,
            "subj": {"surface": "s", "ent_type": "Peop", "start": 0, "end": 1, "entity_id": s_eid, "link_score": 1.0},
            "pred": pred,
            "obj": {"surface": "o", "ent_type": "Org", "start": 2, "end": 3, "entity_id": o_eid, "link_score": 1.0},
            "score": 1.0,
        }

    t = pa.Table.from_pylist(
        [trip("d1", "e:a", "Work_For", "e:b"), trip("d2", "e:a", "Work_For", "e:b"),
         trip("d1", "e:a", "Work_For", "e:b"), trip("d3", "e:z", "Kill", "e:a")]
    )
    adj = materialize_local(t)
    rows = adj.to_pylist()
    assert [r["weight"] for r in rows] == [3, 1]
    assert rows[0]["docs"] == ["d1", "d2"] or rows[0]["docs"] == ["d1", "d2"]
    assert rows[0]["src"] == "e:a" and rows[1]["src"] == "e:z"
    keys = [(r["src"], r["pred"], r["dst"]) for r in rows]
    assert keys == sorted(keys)


@pytest.mark.usefixtures("ray_session")
def test_ray_graph_matches_reference(tiny_corpus):
    import ray
    import ray.data

    from antnre_ray.pipelines.flagship import flagship_graph, reference_graph

    docs, _ = tiny_corpus
    ref = reference_graph(docs)
    g = flagship_graph(ray.data.from_arrow(docs).repartition(4))
    for name in ("entities", "adjacency"):
        tbl = pa.concat_tables(ray.get(g[name].to_arrow_refs()), promote_options="default")
        assert sorted(map(str, tbl.to_pylist())) == sorted(map(str, ref[name].to_pylist())), name


@pytest.mark.usefixtures("ray_session")
def test_incremental_adjacency_equals_full_rebuild(sf001):
    """merge_adjacency(half-A adjacency, half-B triples) must be byte-
    equal to materialize over the whole triple set (weights add; the
    lowest-k provenance cap composes: cap(cap(A)∪cap(B)) == cap(A∪B))."""
    import ray
    import pyarrow as pa

    from antnre_ray.pipelines.kg_queries import kg_adjacency, kg_adjacency_incremental

    inc = pa.concat_tables(
        ray.get(kg_adjacency_incremental(sf001).to_arrow_refs()), promote_options="default"
    )
    full = pa.concat_tables(
        ray.get(kg_adjacency(sf001).to_arrow_refs()), promote_options="default"
    )
    assert sorted(map(str, inc.to_pylist())) == sorted(map(str, full.to_pylist()))


def test_linker_knn_ranks_within_type():
    """A wrong-type entity that is globally nearest must NOT veto a
    same-type entity above threshold (type mask applies BEFORE argmax)."""
    import numpy as np

    from antnre_ray.functions.embed import embed_strings
    from antnre_ray.stages.link import LinkerActor, LinkerState

    # 'paris' (Loc) is the global top-1 for query 'pariss h'; the Peop
    # entity 'pariss hh' is the right-type match above threshold.
    forms = ["pariss h", "pariss hh"]
    state = LinkerState(
        alias={},
        entity_ids=["e:loc", "e:peop"],
        entity_types=["Loc", "Peop"],
        emb=embed_strings(forms),
    )
    actor = LinkerActor(state, threshold=0.5)
    eid, score = actor._link_one("pariss h", "Peop")
    assert eid == "e:peop" and score >= 0.5, (eid, score)
    # and the Loc query still gets the Loc entity (exact, cosine 1.0)
    eid2, score2 = actor._link_one("pariss h", "Loc")
    assert eid2 == "e:loc" and score2 > 0.99


def test_linker_tolerates_null_surface_and_type():
    """Mentions with null surface or ent_type must take the dict-dedup
    fallback (the C-native dictionary path cannot represent null keys)
    and link to deterministic canonical ids instead of crashing."""
    import pyarrow as pa

    from antnre_ray.stages.link import LinkerActor, build_linker_state

    actor = LinkerActor(build_linker_state())
    m = pa.array(
        [[
            {"start": 0, "end": 1, "ent_type": "Peop", "surface": None, "score": 0.5},
            {"start": 1, "end": 2, "ent_type": None, "surface": "x", "score": 0.5},
            {"start": 2, "end": 3, "ent_type": "Peop", "surface": "x", "score": 0.5},
        ]],
        pa.list_(pa.struct([
            ("start", pa.int32()), ("end", pa.int32()), ("ent_type", pa.string()),
            ("surface", pa.string()), ("score", pa.float32()),
        ])),
    )
    out = actor(pa.table({"doc_id": pa.array(["d"]), "mentions": m}))
    linked = out.column("mentions").combine_chunks().flatten()
    eids = linked.field("entity_id").to_pylist()
    assert len(eids) == 3 and all(e for e in eids)
    # Determinism: same batch → same ids.
    out2 = actor(pa.table({"doc_id": pa.array(["d"]), "mentions": m}))
    assert out2.column("mentions").combine_chunks().flatten().field("entity_id").to_pylist() == eids
