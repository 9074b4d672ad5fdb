"""Checkpoint/resume for iterative graph loops — connected_components
(checkpoint_dir=...).

An interrupted run (max_iters too small to converge) resumed from its
checkpoint must reach the exact labels of an uninterrupted run, in
both regimes; resuming across a different graph must refuse."""

from __future__ import annotations

import json
import os

import pytest
import ray

from antnre_ray.stages.graph_algos import connected_components


def _chain(n):
    return [{"src": f"n{i:02d}", "dst": f"n{i + 1:02d}"} for i in range(n - 1)]


def _labels(ds, **kw):
    return {r["node"]: r["label"] for r in connected_components(ds, **kw).take_all()}


@pytest.mark.parametrize("regime_kw", [{}, {"small_graph_nodes": 0}])
def test_interrupt_resume_equals_uninterrupted(ray_session, tmp_path, regime_kw):
    edges = _chain(12)
    ds = ray.data.from_items(edges).repartition(3)
    full = _labels(ds, **regime_kw)
    ck = str(tmp_path / f"ck_{'shuffle' if regime_kw else 'small'}")
    # interrupted: 3 rounds only (chain diameter 11 → not converged)
    partial = _labels(ds, max_iters=3, checkpoint_dir=ck, **regime_kw)
    assert partial != full  # genuinely mid-flight
    meta = json.load(open(os.path.join(ck, "meta.json")))
    assert meta["round"] == 3
    assert os.path.isdir(os.path.join(ck, "state-3"))
    # resume: continues from round 3, reaches the same fixpoint
    resumed = _labels(ds, checkpoint_dir=ck, **regime_kw)
    assert resumed == full
    meta2 = json.load(open(os.path.join(ck, "meta.json")))
    assert meta2["round"] > 3
    # only the latest state dir survives GC
    states = [f for f in os.listdir(ck) if f.startswith("state-") and not f.endswith(".tmp")]
    assert states == [f"state-{meta2['round']}"]


def test_resume_across_different_graph_refuses(ray_session, tmp_path):
    ck = str(tmp_path / "ck")
    connected_components(
        ray.data.from_items(_chain(6)), max_iters=2, checkpoint_dir=ck
    ).take_all()
    with pytest.raises(Exception, match="refusing to resume"):
        connected_components(
            ray.data.from_items(_chain(9)), checkpoint_dir=ck
        ).take_all()


def test_checkpointed_run_without_resume_matches_plain(ray_session, tmp_path):
    edges = _chain(8)
    ds = ray.data.from_items(edges)
    plain = _labels(ds)
    ck = str(tmp_path / "ck")
    with_ck = _labels(ds, checkpoint_dir=ck)
    assert with_ck == plain
    # a SECOND full call resumes from the converged state and is a
    # cheap no-op returning the same labels
    again = _labels(ds, checkpoint_dir=ck)
    assert again == plain
