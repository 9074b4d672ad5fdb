"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001 (driver checks rows>=0).

    Derives the interleaved-document corpus (FIXTURES.md F1 rule) from the
    driver's documents.parquet, then runs validate → assemble → sentencize
    → ExtractorActor and returns the exploded (subj, pred, obj) triples
    Dataset. Ray is already initialised by the driver.
    """
    from antnre_ray.pipelines.flagship import flagship_triples
    from antnre_ray.sources.corpus import derive_interleaved

    ds = derive_interleaved("/root/testdata/sf0.001/documents.parquet")
    return flagship_triples(ds)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from antnre_ray.pipelines.registry import load_all

    return {name: fn for name, (fn, _sql) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query; rows-only checks
    for the rest (model extraction, sketches, near-dedup)."""
    from antnre_ray.pipelines.registry import load_all

    sqls = {name: sql for name, (_fn, sql) in load_all().items() if sql is not None}
    # The kg_top_entities / kg_two_hop oracles re-derive graph analytics
    # over the engine's own written adjacency parquet. The driver's
    # per-entry ray-vs-sql order is unspecified, so pre-write the sweep
    # corpus here (idempotent, keyed per corpus); the Ray query fns
    # rewrite it anyway when they run first.
    import ray

    if ray.is_initialized():
        try:
            from antnre_ray.pipelines.kg_queries import ensure_adjacency_oracle

            ensure_adjacency_oracle("/root/testdata/sf0.01")
        except Exception as exc:
            # Degrades to ray-query-first ordering — but LOUDLY: a real
            # extraction/write failure here would otherwise surface later
            # as an unexplained DuckDB file-not-found (review finding).
            import sys as _sys

            print(f"ensure_adjacency_oracle failed: {exc!r}", file=_sys.stderr)
    return sqls
