"""Fault injection: Ray Data's lineage-based retry must reproduce the
EXACT output after a worker dies mid-stage (SURVEY §4.2 "make every UDF
idempotent & deterministic" — this is the test that claim cashes out
in). The injected UDFs live in antnre_ray.testing so the FRESH worker
that runs the retry can import them (pytest modules can't be imported
by Ray workers)."""

from __future__ import annotations

import os

import pytest

EXPECTED = 10_000 * 9_999 // 2


@pytest.mark.usefixtures("ray_session")
def test_task_worker_crash_is_retried_exactly(tmp_path):
    import ray.data

    from antnre_ray.testing import crash_once_then_identity

    import functools

    # functools.partial keeps the UDF importable-by-reference with the
    # flag bound (a closure would pickle by value and also work; the
    # partial makes the by-reference requirement explicit).
    flag = str(tmp_path / "task_crashed_once")
    ds = ray.data.range(10_000, override_num_blocks=8).map_batches(
        functools.partial(crash_once_then_identity, flag),
        batch_format="pyarrow",
    )
    assert sum(r["id"] for r in ds.take_all()) == EXPECTED
    assert os.path.exists(flag)  # the crash really happened


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_crash_is_restarted_exactly(tmp_path):
    import ray.data

    from antnre_ray.testing import CrashOnceActor

    flag = str(tmp_path / "actor_crashed_once")
    ds = ray.data.range(10_000, override_num_blocks=8).map_batches(
        CrashOnceActor,
        fn_constructor_args=(flag,),
        concurrency=(1, 2),
        batch_format="pyarrow",
    )
    assert sum(r["id"] for r in ds.take_all()) == EXPECTED
    assert os.path.exists(flag)
