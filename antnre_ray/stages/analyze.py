"""Text-analysis stages over a documents table (doc_id, text):
quality counters (SQL-replicable), language ID, BPE-ish token counts,
winnowing fingerprints."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.textstats import (
    bpe_token_count,
    detect_language,
    quality_stats,
    winnow_fingerprint,
)


def text_stats_batch(batch: pa.Table) -> pa.Table:
    stats = quality_stats(batch.column("text"))
    return pa.table({"doc_id": batch.column("doc_id"), **stats})


def text_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(text_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def text_analysis_batch(batch: pa.Table) -> pa.Table:
    """Language ID + BPE token count + fingerprint size + quality score.

    quality_score is a simple trainability heuristic in [0,1]:
    penalizes very short docs, high punct/digit density, low alpha ratio.
    """
    texts = batch.column("text").to_pylist()
    stats = quality_stats(batch.column("text"))
    n_chars = stats["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = stats["alpha_ratio"].to_numpy(zero_copy_only=False)
    n_punct = stats["n_punct"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_digit = stats["n_digit"].to_numpy(zero_copy_only=False).astype(np.float64)
    langs, confs, bpe, fp_sizes = [], [], [], []
    for t in texts:
        lang, conf = detect_language(t)
        langs.append(lang)
        confs.append(conf)
        bpe.append(bpe_token_count(t))
        fp_sizes.append(len(winnow_fingerprint(t)))
    with np.errstate(divide="ignore", invalid="ignore"):
        dens = np.where(n_chars > 0, (n_punct + n_digit) / n_chars, 1.0)
    length_term = np.clip(n_chars / 200.0, 0.0, 1.0)
    score = np.clip(0.5 * alpha + 0.3 * length_term + 0.2 * (1.0 - dens), 0.0, 1.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": pa.array(langs, pa.string()),
            "lang_conf": pa.array(confs, pa.float64()),
            "n_bpe_tokens": pa.array(bpe, pa.int64()),
            "n_fingerprints": pa.array(fp_sizes, pa.int64()),
            "quality_score": pa.array(score, pa.float64()),
        }
    )


def text_analysis(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(text_analysis_batch, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Per-doc winnowing fingerprints, exploded to (doc_id, fp) rows —
    groupby(fp) downstream finds cross-document shared passages."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    o_doc, o_fp = [], []
    for did, t in zip(doc_ids, texts):
        for fp in winnow_fingerprint(t):
            o_doc.append(did)
            o_fp.append(fp)
    return pa.table({"doc_id": pa.array(o_doc, pa.int64()), "fp": pa.array(o_fp, pa.int64())})


def fingerprints(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
