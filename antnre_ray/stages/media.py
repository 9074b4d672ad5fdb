"""Multimodal stages: media spans as opaque refs + typed metadata.

The interleaved corpus carries image/audio spans as ``media_ref``
strings (binary payloads would be a `binary` column with the same
plumbing). Real codecs (PIL/ffmpeg) are NOT in this container, so the
decode kernel is gated: ``decoder="fake"`` (default) produces
deterministic synthetic pixels/samples from the ref hash — making the
Ray-side plumbing (schema, actor pool, batch sizing, output layout)
fully real and testable — while ``decoder="pil"`` raises
NotImplementedError until the dependency exists (SURVEY/media mandate).

Batch sizes here should be SMALL (64) at real payload sizes: batch ×
concurrency must fit worker heaps when the binary column is MBs/row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import stable_u64

MEDIA_FEATURE_DIM = 8


def _fake_feature(key: str) -> np.ndarray:
    """THE deterministic fake-decode feature recipe — one definition so
    per-ref features (MediaFeatureActor) and per-frame features
    (frame_sample_batch) cannot drift apart."""
    u = stable_u64(key)
    rng = np.random.default_rng(u % (2**32))
    f = rng.standard_normal(MEDIA_FEATURE_DIM).astype(np.float32)
    f /= max(float(np.linalg.norm(f)), 1e-12)
    return f


def media_refs_batch(batch: pa.Table) -> pa.Table:
    """documents → exploded (doc_id, span_idx, kind, media_ref) rows for
    every non-text span. Pure Arrow flatten+filter."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    idx_within = pa.array(
        np.arange(len(flat)) - np.repeat(spans.offsets.to_numpy(zero_copy_only=False)[:-1], np.diff(spans.offsets.to_numpy(zero_copy_only=False))),
        pa.int32(),
    )
    t = pa.table(
        {
            "doc_id": batch.column("doc_id").take(parent),
            "span_idx": idx_within,
            "kind": flat.field("kind"),
            "media_ref": flat.field("media_ref"),
        }
    )
    return t.filter(pc.invert(pc.equal(t.column("kind"), "text")))


def media_refs(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(media_refs_batch, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeatureActor:
    """Stateful decode/feature stage (actor pool): a real deployment
    loads the codec/model once here; the sandbox uses the deterministic
    fake decoder."""

    def __init__(self, decoder: str = "fake"):
        if decoder == "fake":
            self._decode = self._decode_fake
        elif decoder == "pil":
            raise NotImplementedError(
                "real image decode requires PIL/ffmpeg, not available in this "
                "container — use decoder='fake' (deterministic stub)"
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    @staticmethod
    def _decode_fake(kind: str, ref: str) -> tuple[int, int, np.ndarray]:
        """Deterministic synthetic decode: dims + a feature vector that
        is a pure function of the ref (stable across runs)."""
        u = stable_u64(ref)
        if kind == "image":
            w, h = 64 + u % 512, 64 + (u >> 16) % 512
        elif kind == "video":  # "width" = frame count, "height" = fps
            w, h = 24 + (u >> 8) % 240, 24
        else:  # audio: "width" = sample rate, "height" = seconds
            w, h = 16000, 1 + (u >> 16) % 120
        return int(w), int(h), _fake_feature(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        ws, hs, feats = [], [], []
        for kind, ref in zip(kinds, refs):
            w, h, f = self._decode(kind, ref)
            ws.append(w)
            hs.append(h)
            feats.append(f)
        feat_arr = (
            pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(feats) if feats else np.zeros(0, np.float32), pa.float32()),
                MEDIA_FEATURE_DIM,
            )
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "feature": feat_arr,
            }
        )


def media_features(ds: ray.data.Dataset, decoder: str = "fake", batch_size: int = 64) -> ray.data.Dataset:
    """media-ref rows → decoded metadata + feature vectors (actor pool;
    small batches on purpose — see module docstring)."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
        num_cpus=1,
    )


def frame_sample_batch(batch: pa.Table, every_n: int = 24, max_frames: int = 8) -> pa.Table:
    """Video frame sampling (1→N flat-map): one row per sampled frame.

    For each video row (as produced by :class:`MediaFeatureActor`, where
    width = frame count), emit frames 0, every_n, 2·every_n, … capped at
    ``max_frames``, each with a deterministic per-frame feature (fake
    decode; a real deployment decodes the frame here). Non-video rows
    pass through zero frames.
    """
    kinds = batch.column("kind").to_pylist()
    refs = batch.column("media_ref").to_pylist()
    docs = batch.column("doc_id").to_pylist()
    widths = batch.column("width").to_pylist()
    o_doc, o_ref, o_idx, o_feat = [], [], [], []
    for doc, kind, ref, nframes in zip(docs, kinds, refs, widths):
        if kind != "video":
            continue
        for fi in list(range(0, int(nframes), every_n))[:max_frames]:
            f = _fake_feature(f"{ref}#frame{fi}")
            o_doc.append(doc)
            o_ref.append(ref)
            o_idx.append(fi)
            o_feat.append(f)
    feat_arr = pa.FixedSizeListArray.from_arrays(
        pa.array(np.concatenate(o_feat) if o_feat else np.zeros(0, np.float32), pa.float32()),
        MEDIA_FEATURE_DIM,
    )
    return pa.table(
        {
            "doc_id": pa.array(o_doc, pa.string()),
            "media_ref": pa.array(o_ref, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "feature": feat_arr,
        }
    )


def frame_samples(ds: ray.data.Dataset, every_n: int = 24, max_frames: int = 8) -> ray.data.Dataset:
    return ds.map_batches(
        frame_sample_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"every_n": every_n, "max_frames": max_frames},
    )


def frame_dedup_pairs(
    frames: ray.data.Dataset, threshold: float = 0.999
) -> ray.data.Dataset:
    """Near-duplicate frames ACROSS documents: each sampled frame
    becomes a vector row (vec_id = stable hash of doc|ref#frame — the
    doc in the key makes the same video cited by two docs produce two
    ids with identical features, i.e. a cosine-1 pair, which is the
    cross-document duplicate signal) and flows through the SAME
    hyperplane-LSH plan as text-embedding dedup
    (stages/dedup.embedding_dedup_pairs). Output: (doc_a, doc_b,
    cosine) hashed frame-id pairs."""
    from ..functions.hashing import stable_u64
    from .dedup import embedding_dedup_pairs

    def rekey(b: pa.Table) -> pa.Table:
        docs = b.column("doc_id").to_pylist()
        refs = b.column("media_ref").to_pylist()
        idxs = b.column("frame_idx").to_pylist()
        ids = [
            int(stable_u64(f"{d}|{r}#f{i}")) >> 1
            for d, r, i in zip(docs, refs, idxs)
        ]
        feat = b.column("feature")
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        emb = pa.FixedSizeListArray.from_arrays(
            feat.flatten().cast(pa.float64()), MEDIA_FEATURE_DIM
        )
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})

    vecs = frames.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)
    return embedding_dedup_pairs(vecs, threshold=threshold, dim=MEDIA_FEATURE_DIM)
