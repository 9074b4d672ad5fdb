"""The cheap ids path must stay in lockstep with the real derivation."""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_derived_doc_ids_match_derivation(sf001):
    import ray

    from antnre_ray.sources.corpus import derive_interleaved, derived_doc_ids
    from antnre_ray.stages.validate import validate_batch

    for repeat in (1, 2):
        cheap = derived_doc_ids(f"{sf001}/documents.parquet", repeat=repeat, partitions=8)
        full = pa.concat_tables(
            ray.get(
                derive_interleaved(f"{sf001}/documents.parquet", repeat=repeat).to_arrow_refs()
            ),
            promote_options="default",
        )
        full_v = validate_batch(full, partitions=8)
        assert sorted(cheap.column("doc_id").to_pylist()) == sorted(full_v.column("doc_id").to_pylist())
        cheap_map = dict(zip(cheap.column("doc_id").to_pylist(), cheap.column("part_id").to_pylist()))
        full_map = dict(zip(full_v.column("doc_id").to_pylist(), full_v.column("part_id").to_pylist()))
        assert cheap_map == full_map
