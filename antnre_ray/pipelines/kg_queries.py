"""KG-pipeline queries for the driver harness: the flagship stages over
the interleaved corpus derived from each sf_dir's documents.parquet.

No SQL oracles — joint NER+RE extraction is not SQL-expressible — so the
driver records rows-only checks; determinism and golden-equality are
covered by tests/test_flagship_golden.py instead."""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..sources.corpus import derive_interleaved
from .flagship import (
    extractions_from_documents,
    flagship_graph,
    flagship_triples,
    linked_extractions,
)
from .registry import register


def _corpus(sf_dir: str) -> ray.data.Dataset:
    return derive_interleaved(f"{sf_dir}/documents.parquet")


@register("kg_extractions", None)
def kg_extractions(sf_dir: str) -> ray.data.Dataset:
    return extractions_from_documents(_corpus(sf_dir))


@register("kg_triples", None)
def kg_triples(sf_dir: str) -> ray.data.Dataset:
    return flagship_triples(_corpus(sf_dir))


@register("kg_linked_triples", None)
def kg_linked_triples(sf_dir: str) -> ray.data.Dataset:
    from ..stages.explode import triples_table

    return triples_table(linked_extractions(_corpus(sf_dir)))


@register("kg_entities", None)
def kg_entities(sf_dir: str) -> ray.data.Dataset:
    return flagship_graph(_corpus(sf_dir))["entities"]


@register("kg_adjacency", None)
def kg_adjacency(sf_dir: str) -> ray.data.Dataset:
    return flagship_graph(_corpus(sf_dir))["adjacency"]


@register("kg_top_entities", None)
def kg_top_entities(sf_dir: str) -> ray.data.Dataset:
    """Graph analytics over the materialized adjacency: out-degree and
    total edge weight per source node, top 20 — the groupby runs over
    the (already edge-aggregated) adjacency, not the raw triples."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    adj = flagship_graph(_corpus(sf_dir))["adjacency"]

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("src"), "weight": b.column("weight")})

    deg = (
        adj.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("src")
        .aggregate(Count(alias_name="out_degree"), Sum("weight", alias_name="total_weight"))
    )
    return deg.sort(["total_weight", "src"], descending=[True, False]).limit(20)


@register("kg_two_hop", None)
def kg_two_hop(sf_dir: str) -> ray.data.Dataset:
    """Two-hop reachability over the materialized graph: adjacency
    self-joined on dst=src (hash shuffle join), path weight = product of
    edge weights, aggregated per (src, dst) pair. Top 20 by weight."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    adj = flagship_graph(_corpus(sf_dir))["adjacency"]

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {"src": b.column("src"), "dst": b.column("dst"), "weight": b.column("weight")}
        )

    edges = adj.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    try:
        import ray as _ray

        nparts = max(4, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    except Exception:
        nparts = 8
    two = edges.join(
        edges,
        join_type="inner",
        num_partitions=nparts,
        on=("dst",),
        right_on=("src",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def combine(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c) for c in b.column_names}
        src = cols.get("src", cols.get("src_a"))
        dst = cols.get("dst_b", cols.get("dst"))
        w = pc.multiply(cols.get("weight_a", cols.get("weight")), cols["weight_b"])
        t = pa.table({"src": src, "dst": dst, "path_weight": pc.cast(w, pa.int64())})
        g = t.group_by(["src", "dst"]).aggregate([("path_weight", "sum")])
        return g.rename_columns(["src", "dst", "path_weight"])

    out = (
        two.map_batches(combine, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("path_weight", alias_name="path_weight"))
    )
    return out.sort(["path_weight", "src", "dst"], descending=[True, False, False]).limit(20)


@register("kg_eval_prf", None)
def kg_eval_prf(sf_dir: str):
    """A20 corpus-scale eval: surface-level micro P/R/F1 of the Ray
    pipeline's triples against the gold planted by the corpus deriver
    (the P/R≥0.95 gate, BASELINE.json:2). One metrics row."""
    import pyarrow as pa
    import ray

    from ..sources.corpus import derived_gold_triples

    pred_ds = flagship_triples(_corpus(sf_dir))
    pred = pa.concat_tables(ray.get(pred_ds.to_arrow_refs()), promote_options="default")
    pred_keys = {
        (r["doc_id"], r["subj"]["surface"], r["pred"], r["obj"]["surface"])
        for r in pred.to_pylist()
    }
    gold_tbl = derived_gold_triples(f"{sf_dir}/documents.parquet")
    gold_keys = {
        (d, s, p, o)
        for d, s, p, o in zip(
            gold_tbl.column("doc_id").to_pylist(),
            gold_tbl.column("subj_surface").to_pylist(),
            gold_tbl.column("pred").to_pylist(),
            gold_tbl.column("obj_surface").to_pylist(),
        )
    }
    from .evaluate import prf

    m = prf(pred_keys, gold_keys)
    return pa.table({k: pa.array([v], pa.float64()) for k, v in m.items()})
