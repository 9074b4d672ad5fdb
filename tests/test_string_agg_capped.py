"""b67_string_agg_capped: the b42 escape hatch must be EXACT — the
per-batch cap combiner (ship at most `cap` names per (block, group))
merges to the same answer as a global sort, because the global
smallest-cap set is a subset of the union of per-batch smallest-cap
sets. Verified here on a synthetic sf_dir large enough to split into
multiple partial batches."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def synth_sf(tmp_path):
    n_nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["AAA", "BBB", "CCC"], pa.string()),
            "n_regionkey": pa.array([0, 0, 1], pa.int64()),
        }
    )
    # 3000 suppliers → several map_batches partials; names crafted so
    # the global first-5 per group straddles batch boundaries
    keys = [i % 3 for i in range(3000)]
    names = [f"sup#{(7919 * i) % 3000:05d}" for i in range(3000)]
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(3000), pa.int64()),
            "s_name": pa.array(names, pa.string()),
            "s_nationkey": pa.array(keys, pa.int64()),
        }
    )
    pq.write_table(n_nation, tmp_path / "nation.parquet")
    pq.write_table(supplier, tmp_path / "supplier.parquet")
    return str(tmp_path), keys, names


@pytest.mark.usefixtures("ray_session")
def test_capped_agg_exact_across_batches(synth_sf):
    import ray

    from antnre_ray.pipelines.relational import b67_string_agg_capped

    sf, keys, names = synth_sf
    got = {
        r["n_name"]: (r["members_capped"], r["total_members"])
        for r in b67_string_agg_capped(sf).take_all()
    }
    want_groups = {"AAA": 0, "BBB": 1, "CCC": 2}
    for n_name, k in want_groups.items():
        members = sorted(nm for nm, kk in zip(names, keys) if kk == k)
        assert got[n_name] == (",".join(members[:5]), len(members))
    assert set(got) == set(want_groups)
