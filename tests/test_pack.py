"""Sequence-packing invariants (stages/pack.py): exactness of the
doc→bin assignment, budget respect, and a fill-factor floor."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"
BUDGET = 512


@pytest.fixture(scope="module")
def packed(ray_session):
    from antnre_ray.stages.pack import pack_sequences

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return pa.Table.from_pylist(pack_sequences(ds, budget=BUDGET, shards=8).take_all())


def test_every_doc_packed_exactly_once(packed, ray_session):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    got = sorted(packed.column("doc_id").to_pylist())
    want = sorted(docs.column("doc_id").to_pylist())
    assert got == want


def test_no_bin_over_budget(packed):
    df = packed.to_pandas()
    fills = df.groupby("bin_id").agg(total=("n_tokens", "sum"), n=("doc_id", "count"))
    over = fills[fills.total > BUDGET]
    # only single-doc (oversize) bins may exceed the budget, and those
    # rows must be flagged truncated
    assert (over.n == 1).all()
    trunc_ids = set(df[df.truncated].bin_id)
    assert set(over.index) == trunc_ids


def test_fill_factor_reasonable(packed):
    df = packed.to_pandas()
    fills = df.groupby("bin_id")["n_tokens"].sum().clip(upper=BUDGET)
    assert fills.mean() / BUDGET > 0.6, fills.mean()


def test_deterministic_across_partitionings(ray_session):
    from antnre_ray.stages.pack import pack_sequences

    base = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = pa.Table.from_pylist(pack_sequences(base, budget=BUDGET, shards=8).take_all())
    b = pa.Table.from_pylist(
        pack_sequences(base.repartition(7), budget=BUDGET, shards=8).take_all()
    )
    ka = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    kb = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (ka.bin_id.values == kb.bin_id.values).all()
    assert (ka.n_tokens.values == kb.n_tokens.values).all()
