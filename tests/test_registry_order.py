"""Guard the driver-sweep verification budget (VERDICT r2 item #10).

The external correctness sweep checks only the first
``registry.SWEEP_CAP`` entries of ``load_all()``. Round 2 lost driver
verification for 9 oracle-backed queries by registering them past that
cap; these tests make the regression impossible to repeat silently.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_verified() -> set[str]:
    """Names hash-verified by any past driver sweep (CORRECTNESS_r*.json)."""
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match"):
                    seen.add(name)
    return seen


def test_every_unverified_oracle_query_is_inside_the_sweep_window():
    from antnre_ray.pipelines import registry

    q = registry.load_all()
    window = list(q)[: registry.SWEEP_CAP]
    verified = _driver_verified()
    stragglers = [
        n for n in q if q[n][1] is not None and n not in verified and n not in window
    ]
    assert not stragglers, (
        f"oracle-backed queries with no driver verification sit past entry "
        f"{registry.SWEEP_CAP} and will never be checked: {stragglers}"
    )


def test_prefix_names_all_exist():
    """A typo'd / renamed prefix entry would silently shrink the window."""
    from antnre_ray.pipelines import registry

    q = registry.load_all()
    missing = [n for n in registry._PREFIX if n not in q]
    assert not missing, f"_PREFIX names not in registry: {missing}"


def test_registry_prefix_order_is_applied():
    from antnre_ray.pipelines import registry

    q = registry.load_all()
    assert list(q)[: len(registry._PREFIX)] == [
        n for n in registry._PREFIX if n in q
    ]
