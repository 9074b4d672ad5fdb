"""Repo-wide guard for driver-side collections (VERDICT r4 ask #3).

Every ``take_all()`` in non-test source must be one of:
  - inside ``functions.fold.tree_fold`` (the bounding primitive), or
  - bounded by construction (post-groupby over a low-cardinality key,
    an inline repartition(16) merge level, a constant-size sample),

and every such site must be whitelisted HERE with its bound stated.
A new ``take_all()`` anywhere else fails this test until its bound is
documented — the static complement of fold.py's runtime RuntimeError.
"""

from __future__ import annotations

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent

# (posix relpath, innermost enclosing function) -> documented bound
WHITELIST = {
    ("antnre_ray/functions/fold.py", "tree_fold"):
        "the bounding primitive itself: repartition(k) merge level caps the "
        "collection at k x rows_per_merge rows, RuntimeError-enforced",
    ("antnre_ray/pipelines/relational.py", "_distill_keys"):
        "repartition(16) + per-partition re-unique: <= 16 x |distinct| rows; "
        "the driver must hold the distilled key set - it IS the broadcast payload",
    ("antnre_ray/pipelines/relational.py", "_distinct_vals"):
        "post-groupby: one row per distinct value of a low-cardinality column",
    ("antnre_ray/pipelines/relational.py", "b15b_quantiles"):
        "post-groupby value histogram: one row per distinct l_quantity (<= 50)",
    ("antnre_ray/pipelines/relational.py", "b15c_grouped_quantiles"):
        "post-groupby (flag, value) histogram: |flags| x |distinct quantities| rows",
    ("antnre_ray/pipelines/relational.py", "q02_top_supplier_per_nation"):
        "post-groupby per-nation max: one row per nation (25)",
    ("antnre_ray/pipelines/relational.py", "b16d_rollup"):
        "post-groupby leaf counts: |sources| x |langs| rows (grouping-sets input)",
    ("antnre_ray/pipelines/relational.py", "b55_cube"):
        "post-groupby leaf counts: |sources| x |langs| rows (CUBE lattice input)",
    ("antnre_ray/pipelines/relational.py", "b64_chi_square"):
        "post-groupby contingency cells: |event types| x 2 rows",
    ("antnre_ray/pipelines/relational.py", "b40_global_row_number"):
        "post-groupby bucket counts: one row per hour bucket (offset table)",
    ("antnre_ray/pipelines/relational.py", "b40b_row_number_rangepart"):
        "post-groupby bucket counts: one row per range partition (offset table)",
    ("antnre_ray/pipelines/relational.py", "_orphans_antijoin"):
        "anti-join violation keys: bounded by the planted/actual FK violation "
        "count an audit exists to surface (0 on clean data)",
    ("antnre_ray/stages/analyze.py", "dsir_select"):
        "hash-sampled threshold draw: cut64 filter bounds it at ~1.25 x 4096 rows",
    ("antnre_ray/stages/graph_algos.py", "pagerank"):
        "per-round dangling fold over ranks repartitioned to nparts: "
        "O(shuffle width) rows, not O(blocks)",
    ("antnre_ray/stages/graph_algos.py", "association_rules"):
        "item-side vocabulary counts: small by construction (see docstring)",
    ("antnre_ray/stages/search.py", "bm25_topk"):
        "inline repartition(16) + per-partition top-k: <= 16k rows",
    ("antnre_ray/stages/similarity.py", "_bottomk_sample"):
        "inline repartition(16) + per-partition bottom-k: <= 16k rows",
}

SCAN = ["antnre_ray", "jobs", "bench.py", "__ray_entry__.py"]


def _sites() -> set[tuple[str, str]]:
    found = set()
    for top in SCAN:
        p = REPO / top
        files = sorted(p.rglob("*.py")) if p.is_dir() else [p]
        for f in files:
            src = f.read_text()
            if ".take_all(" not in src:
                continue
            tree = ast.parse(src)
            funcs = [
                (n.lineno, n.end_lineno, n.name)
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            rel = f.relative_to(REPO).as_posix()
            for node in ast.walk(tree):
                if isinstance(node, ast.Attribute) and node.attr == "take_all":
                    ln = node.lineno
                    enc = sorted((b - a, name) for (a, b, name) in funcs if a <= ln <= b)
                    found.add((rel, enc[0][1] if enc else "<module>"))
    return found


def test_every_take_all_site_is_whitelisted_with_a_bound():
    sites = _sites()
    new = sites - set(WHITELIST)
    assert not new, (
        "take_all() sites without a documented driver-side bound "
        f"(add tree_fold or whitelist with the bound): {sorted(new)}"
    )


def test_whitelist_has_no_stale_entries():
    stale = set(WHITELIST) - _sites()
    assert not stale, f"whitelisted take_all sites no longer exist: {sorted(stale)}"
