"""Resume tests (SURVEY.md §5.2): kill-and-rerun must skip done
partitions and reproduce identical outputs."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_dir(d: str) -> pa.Table:
    return pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    )


def _norm(t: pa.Table) -> list[str]:
    return sorted(map(str, t.to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_done_partitions(tmp_path, tiny_corpus):
    import ray.data

    from antnre_ray.config import PipelineConfig
    from antnre_ray.state.lineage import STAGE_EXTRACT, run_flagship_resumable
    from antnre_ray.state.metrics import run_report

    docs, _ = tiny_corpus
    cfg = PipelineConfig(partitions=4)

    def factory():
        return ray.data.from_arrow(docs)

    out = str(tmp_path / "run")
    r1 = run_flagship_resumable(factory, out, cfg)
    assert sorted(r1["processed_partitions"]) == [0, 1, 2, 3]
    assert r1["graph_ran"]
    adj1 = _norm(_read_dir(r1["adjacency"]))
    ents1 = _norm(_read_dir(r1["entities"]))
    assert adj1 and ents1

    # Rerun untouched: everything skips.
    r2 = run_flagship_resumable(factory, out, cfg)
    assert r2["processed_partitions"] == []
    assert sorted(r2["skipped_partitions"]) == [0, 1, 2, 3]
    assert not r2["graph_ran"]

    # Simulate a failed shard: drop partition 2's manifest + output.
    r1["manifest"].invalidate(STAGE_EXTRACT, 2)
    shutil.rmtree(os.path.join(out, STAGE_EXTRACT, "part_id=2"))
    r3 = run_flagship_resumable(factory, out, cfg)
    assert r3["processed_partitions"] == [2], "only the failed shard recomputes"
    assert sorted(r3["skipped_partitions"]) == [0, 1, 3]
    # Graph stage re-runs (its input set was restored) and outputs are identical.
    assert _norm(_read_dir(r3["adjacency"])) == adj1
    assert _norm(_read_dir(r3["entities"])) == ents1

    rep = run_report(out)
    assert rep["partitions_done"] == 4
    assert rep["triples"] > 0 and rep["skew"]["max_mentions_per_entity"] >= 1


@pytest.mark.usefixtures("ray_session")
def test_resume_detects_changed_input(tmp_path, tiny_corpus):
    import ray.data

    from antnre_ray.config import PipelineConfig
    from antnre_ray.sources.corpus import synthesize_documents
    from antnre_ray.state.lineage import run_flagship_resumable

    docs, _ = tiny_corpus
    cfg = PipelineConfig(partitions=2)
    out = str(tmp_path / "run")
    run_flagship_resumable(lambda: ray.data.from_arrow(docs), out, cfg)

    # A different corpus (one more doc) must invalidate affected partitions.
    docs2, _ = synthesize_documents(65)
    r = run_flagship_resumable(lambda: ray.data.from_arrow(docs2), out, cfg)
    assert r["processed_partitions"], "changed fingerprints must trigger recompute"
    assert r["graph_ran"]


@pytest.mark.usefixtures("ray_session")
def test_resume_invalidates_on_config_change(tmp_path, tiny_corpus):
    """Changing an output-affecting config knob (link_threshold here)
    must re-run the partitions — a checkpoint computed under the old
    config is stale even when the input doc set is identical."""
    import ray.data

    from antnre_ray.config import PipelineConfig
    from antnre_ray.state.lineage import run_flagship_resumable

    docs, _ = tiny_corpus
    out = str(tmp_path / "run")
    run_flagship_resumable(lambda: ray.data.from_arrow(docs), out, PipelineConfig(partitions=2))
    # identical input + identical config → all skipped
    r_same = run_flagship_resumable(
        lambda: ray.data.from_arrow(docs), out, PipelineConfig(partitions=2)
    )
    assert not r_same["processed_partitions"] and not r_same["graph_ran"]
    # identical input, different linking threshold → everything re-runs
    cfg2 = PipelineConfig(partitions=2, link_threshold=0.5)
    r_diff = run_flagship_resumable(lambda: ray.data.from_arrow(docs), out, cfg2)
    assert r_diff["processed_partitions"] and r_diff["graph_ran"]
