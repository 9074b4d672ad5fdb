"""Lexical retrieval over a documents table: BM25 top-k for a query
string — the term-based complement to stages/similarity.py's embedding
ANN (training-data curation uses both: lexical for targeted quality /
contamination probes, embeddings for semantic near-dup).

Scale shape: two streaming passes, no shuffle of text.
  Pass 1 (stats): per-batch partials of (n_docs, total_doc_len, per-
    query-term document frequencies) — a few ints per block, merged
    driver-side (the sketch pattern).
  Pass 2 (score): broadcast the query-term idf/avgdl constants, score
    each batch fully vectorized (one count_substring_regex per term),
    keep each batch's local top-k, merge the tiny (k × blocks) pool on
    the driver. The corpus is read twice but never leaves its nodes;
    both passes prune to (doc_id, text).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

K1 = 1.5
B = 0.75


def _tokenize_query(query: str) -> list[str]:
    return [t for t in re.findall(r"[a-z0-9]+", query.lower()) if t]


def _doc_len(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    trimmed = pc.replace_substring_regex(text, pattern=r"^\s+|\s+$", replacement="")
    n = pc.add(pc.cast(pc.count_substring_regex(trimmed, r"\s+"), pa.int64()), 1)
    n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int64()), n)
    return n.to_numpy(zero_copy_only=False)


def _term_tf(text, term: str) -> np.ndarray:
    # \b works identically in RE2; terms are [a-z0-9]+ so no escaping needed
    pat = r"(?i)\b" + term + r"\b"
    return pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False)


def bm25_topk(ds: ray.data.Dataset, query: str, k: int = 10) -> pa.Table:
    """Top-k (doc_id, score) for `query` under BM25 (k1=1.5, b=0.75).
    Deterministic: ties break on doc_id ascending."""
    terms = _tokenize_query(query)
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})

    def stats(b: pa.Table) -> pa.Table:
        text = b.column("text")
        dl = _doc_len(text)
        dfs = [int((_term_tf(text, t) > 0).sum()) for t in terms]
        return pa.table(
            {
                "n_docs": pa.array([b.num_rows], pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], pa.int64()),
                "df": pa.array([dfs], pa.list_(pa.int64())),
            }
        )

    def merge_stats(b: pa.Table) -> pa.Table:
        """tree_fold merge: integer sums of (n_docs, sum_dl, df[])."""
        if b.num_rows == 0:
            return pa.table(
                {
                    "n_docs": pa.array([], pa.int64()),
                    "sum_dl": pa.array([], pa.int64()),
                    "df": pa.array([], pa.list_(pa.int64())),
                }
            )
        df_sum = np.sum([np.asarray(x, dtype=np.int64) for x in b.column("df").to_pylist()], axis=0)
        return pa.table(
            {
                "n_docs": pa.array([int(pc.sum(b.column("n_docs")).as_py() or 0)], pa.int64()),
                "sum_dl": pa.array([int(pc.sum(b.column("sum_dl")).as_py() or 0)], pa.int64()),
                "df": pa.array([df_sum.tolist()], pa.list_(pa.int64())),
            }
        )

    from ..functions.fold import tree_fold

    parts = tree_fold(
        ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True), merge_stats
    )
    n_docs = sum(p["n_docs"] for p in parts)
    if n_docs == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
    avgdl = max(sum(p["sum_dl"] for p in parts) / n_docs, 1e-9)
    df = np.sum([np.asarray(p["df"]) for p in parts], axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(b: pa.Table) -> pa.Table:
        text = b.column("text")
        dl = _doc_len(text).astype(np.float64)
        norm = K1 * (1.0 - B + B * dl / avgdl)
        s = np.zeros(b.num_rows, dtype=np.float64)
        for t_idf, term in zip(idf, terms):
            tf = _term_tf(text, term).astype(np.float64)
            s += t_idf * tf * (K1 + 1.0) / np.maximum(tf + norm, 1e-12)
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        top = np.lexsort((did, -s))[:k]
        return pa.table(
            {
                "doc_id": pa.array(did[top], pa.int64()),
                "score": pa.array(s[top], pa.float64()),
            }
        )

    def pool_topk(b: pa.Table) -> pa.Table:
        """bounding merge level: global top-k ⊆ each partition's top-k."""
        if b.num_rows <= k:
            return b
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        s = b.column("score").to_numpy(zero_copy_only=False)
        keep = np.lexsort((did, -s))[:k]
        return b.take(pa.array(np.sort(keep)))

    pool = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(16)
        .map_batches(pool_topk, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    did = np.array([p["doc_id"] for p in pool], dtype=np.int64)
    sc = np.array([p["score"] for p in pool], dtype=np.float64)
    top = np.lexsort((did, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(did[top], pa.int64()),
            "score": pa.array(sc[top], pa.float64()),
        }
    )
