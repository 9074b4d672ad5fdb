"""B30 user-extension surface: Pipeline/Step compile onto Datasets, the
no-Ray twin matches, and steps can be swapped/inserted."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_pipeline_local_matches_reference(tiny_corpus):
    from antnre_ray.pipelines.api import flagship_pipeline
    from antnre_ray.pipelines.flagship import reference_extractions

    docs, _ = tiny_corpus
    got = flagship_pipeline().run_local(docs)
    want = reference_extractions(docs)
    assert sorted(map(str, got.to_pylist())) == sorted(map(str, want.to_pylist()))


def test_pipeline_step_swap_and_insert(tiny_corpus):
    from antnre_ray.pipelines.api import Step, flagship_pipeline

    docs, _ = tiny_corpus
    pipe = flagship_pipeline()

    # Custom user step: drop every doc whose id ends in an even digit.
    def keep_odd(batch: pa.Table) -> pa.Table:
        keep = [int(d[-1]) % 2 == 1 for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(keep))

    extended = pipe.inserted_after("validate", Step("keep_odd", keep_odd))
    out = extended.run_local(docs)
    assert 0 < out.num_rows
    assert all(int(d[-1]) % 2 == 1 for d in set(out.column("doc_id").to_pylist()))

    # Swapping a step by name.
    def no_op_sentencize(batch: pa.Table) -> pa.Table:
        from antnre_ray.stages.sentencize import sentencize_batch

        return sentencize_batch(batch)

    swapped = pipe.replaced("sentencize", Step("sentencize", no_op_sentencize))
    assert swapped.run_local(docs).num_rows == pipe.run_local(docs).num_rows
    with pytest.raises(KeyError):
        pipe.replaced("nope", Step("x", keep_odd))


@pytest.mark.usefixtures("ray_session")
def test_pipeline_compiles_to_dataset(tiny_corpus):
    import ray
    import ray.data

    from antnre_ray.pipelines.api import flagship_pipeline

    docs, _ = tiny_corpus
    pipe = flagship_pipeline()
    ds = pipe(ray.data.from_arrow(docs).repartition(2))
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()), promote_options="default")
    local = pipe.run_local(docs)

    # Identity (spans, types, predicates) compares EXACTLY; float scores
    # with tolerance — matmul/prefix-sum blocking wobbles ~1e-6 with the
    # bucket shape (the repo-wide score-comparison contract, see
    # test_flagship_golden).
    def ident(rows):
        out = []
        for r in rows:
            out.append(
                (
                    r["doc_id"], r["sent_id"],
                    tuple((m["start"], m["end"], m["ent_type"], m["surface"]) for m in r["mentions"]),
                    tuple((t["subj_idx"], t["obj_idx"], t["pred"]) for t in r["triples"]),
                )
            )
        return sorted(out)

    a_rows, b_rows = tbl.to_pylist(), local.to_pylist()
    assert ident(a_rows) == ident(b_rows)
    a_scores = {
        (r["doc_id"], r["sent_id"], m["start"]): m["score"] for r in a_rows for m in r["mentions"]
    }
    b_scores = {
        (r["doc_id"], r["sent_id"], m["start"]): m["score"] for r in b_rows for m in r["mentions"]
    }
    assert a_scores.keys() == b_scores.keys()
    assert max(abs(a_scores[k] - b_scores[k]) for k in a_scores) < 1e-3
