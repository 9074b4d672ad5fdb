"""BM25 retrieval (stages/search.py): parity with a brute-force
reference implementation and basic relevance sanity."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pytest

import ray.data

QUERY = "data processing pipeline"


def _reference_bm25(docs: list[tuple[int, str]], query: str, k=10, k1=1.5, b=0.75):
    terms = re.findall(r"[a-z0-9]+", query.lower())
    dls = []
    tfs = []
    for _, text in docs:
        toks = text.split()
        dls.append(len(toks))
        tfs.append(
            {t: sum(1 for _ in re.finditer(r"(?i)\b" + t + r"\b", text)) for t in terms}
        )
    n = len(docs)
    avgdl = sum(dls) / n
    out = []
    for (did, _), dl, tf in zip(docs, dls, tfs):
        s = 0.0
        for t in terms:
            df = sum(1 for x in tfs if x[t] > 0)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf[t] * (k1 + 1) / (tf[t] + k1 * (1 - b + b * dl / avgdl))
        out.append((did, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:k]


def test_bm25_matches_reference(ray_session, sf001):
    import pyarrow.parquet as pq

    from antnre_ray.stages.search import bm25_topk

    tbl = pq.read_table(f"{sf001}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    want = _reference_bm25(docs, QUERY)
    got = bm25_topk(
        ray.data.read_parquet(f"{sf001}/documents.parquet", columns=["doc_id", "text"]),
        QUERY,
    )
    assert got.column("doc_id").to_pylist() == [d for d, _ in want]
    np.testing.assert_allclose(
        got.column("score").to_pylist(), [s for _, s in want], rtol=1e-9
    )


def test_bm25_planted_doc_ranks_first(ray_session):
    from antnre_ray.stages.search import bm25_topk

    rows = [{"doc_id": i, "text": f"filler words number {i} nothing relevant here"} for i in range(50)]
    rows.append({"doc_id": 99, "text": "data processing pipeline data pipeline processing"})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(5)
    got = bm25_topk(ds, QUERY, k=3)
    assert got.column("doc_id")[0].as_py() == 99


def test_bm25_partition_invariant(ray_session, sf001):
    from antnre_ray.stages.search import bm25_topk

    base = ray.data.read_parquet(f"{sf001}/documents.parquet", columns=["doc_id", "text"])
    a = bm25_topk(base, QUERY)
    b = bm25_topk(base.repartition(11), QUERY)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
