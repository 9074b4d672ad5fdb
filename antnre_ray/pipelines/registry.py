"""Query registry: every operator the engine exposes to the driver
(__ray_entry__.py contract) registers here as name → (callable(sf_dir),
oracle SQL | None). SQL-None entries get the driver's rows-only check
(non-SQL-expressible ops: model extraction, sketches, near-dedup)."""

from __future__ import annotations

QUERIES: dict[str, tuple] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def load_all() -> dict[str, tuple]:
    """Import every query-providing module (side-effect registration)."""
    from . import kg_queries, relational  # noqa: F401

    try:
        from . import extras  # noqa: F401  (dedup/similarity/text analysis)
    except ImportError:
        pass
    return QUERIES
