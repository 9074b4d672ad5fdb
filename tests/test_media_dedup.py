"""Cross-document frame dedup — stages/media.frame_dedup_pairs.

Two documents citing the same video must produce cosine-1 frame pairs
(one per sampled frame); distinct videos must not pair under the fake
(hash-derived) features."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from antnre_ray.stages.media import MEDIA_FEATURE_DIM, frame_dedup_pairs


def _frames(rows):
    feats = pa.FixedSizeListArray.from_arrays(
        pa.array(
            np.concatenate([r["feature"] for r in rows]).astype(np.float32),
            pa.float32(),
        ),
        MEDIA_FEATURE_DIM,
    )
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "media_ref": pa.array([r["media_ref"] for r in rows], pa.string()),
            "frame_idx": pa.array([r["frame_idx"] for r in rows], pa.int32()),
            "feature": feats,
        }
    )
    return ray.data.from_arrow(t)


def _feat(seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(MEDIA_FEATURE_DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


def test_shared_video_pairs_distinct_videos_dont(ray_session):
    shared = [_feat(1), _feat(2)]  # the shared video's two frames
    rows = []
    for doc in ("docA", "docB"):  # both docs cite video v1
        for fi, f in enumerate(shared):
            rows.append(
                {"doc_id": doc, "media_ref": "media://vid/v1", "frame_idx": fi * 24, "feature": f}
            )
    # a third doc with its own video
    rows.append(
        {"doc_id": "docC", "media_ref": "media://vid/v2", "frame_idx": 0, "feature": _feat(3)}
    )
    pairs = frame_dedup_pairs(_frames(rows)).take_all()
    # exactly one pair per shared frame (2), all at cosine ~1
    assert len(pairs) == 2
    for p in pairs:
        assert p["cosine"] >= 0.999


def test_no_pairs_on_unique_frames(ray_session):
    rows = [
        {
            "doc_id": f"d{i}",
            "media_ref": f"media://vid/v{i}",
            "frame_idx": 0,
            "feature": _feat(10 + i),
        }
        for i in range(8)
    ]
    assert frame_dedup_pairs(_frames(rows)).take_all() == []


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["media_frame_dedup"]
    assert sql is None
    rows = fn(sf001).take_all()  # derived corpus has unique refs → usually empty
    for r in rows:
        assert r["cosine"] >= 0.999
