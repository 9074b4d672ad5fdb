"""Iterative graph algorithms over the materialized adjacency (A19
output): connected components via distributed min-label propagation.

The shape is the canonical Pregel-on-a-Dataset loop: per iteration one
hash join (labels → edge endpoints) and one grouped MIN — both
key-partitioned exchanges, no driver-side graph. Labels are int64
hashes of node ids (monotonically non-increasing under min-propagation),
so convergence is detected from the GLOBAL label sum, which strictly
decreases until the fixpoint — one cheap aggregate per iteration
instead of a diff join. The per-iteration label table (one row per
node) is materialized: it is node-scale, not edge-scale, and feeding a
lazy 10-join lineage into iteration N would re-execute every earlier
round per consumer.

Partitioning assumption: labels and messages shuffle on node id; skewed
high-degree nodes cost one reducer their in-degree in messages per
iteration (pre-aggregated per batch by the combiner before the global
MIN, so the wire cost is capped at |distinct dst per batch|).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min

from ..functions.hashing import stable_u64_array


def _label_of(ids: list[str]) -> np.ndarray:
    # int64-positive stable hash: min() over these is a deterministic
    # component representative (collision odds ~n^2/2^63 — negligible).
    return (stable_u64_array(ids) >> np.uint64(1)).astype(np.int64)


def connected_components(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> ray.data.Dataset:
    """(node, component) for every node in the edge list.

    ``component`` is the minimum node-label hash in the node's connected
    component (undirected reachability regardless of edge direction).
    """

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column(src_col).to_pylist()
        d = b.column(dst_col).to_pylist()
        return pa.table(
            {
                "u": pa.array(s + d, pa.string()),
                "v": pa.array(d + s, pa.string()),
            }
        )

    und = edges.map_batches(undirect, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        ids = b.column("u").to_pylist()
        t = pa.table({"node": b.column("u"), "label": pa.array(_label_of(ids), pa.int64())})
        return t.group_by(["node"]).aggregate([("label", "min")]).rename_columns(["node", "label"])

    labels = (
        und.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    nparts = max(4, cpus // 4)

    def checksum(ds: ray.data.Dataset) -> int:
        from ray.data.aggregate import Sum

        return int(ds.aggregate(Sum("label", alias_name="s"))["s"])

    prev = checksum(labels)
    for _ in range(max_iters):
        # message pass: each edge (u, v) sends u's current label to v.
        msgs = und.join(
            labels, join_type="inner", num_partitions=nparts, on=("u",), right_on=("node",)
        )

        def to_msgs(b: pa.Table) -> pa.Table:
            t = pa.table({"node": b.column("v"), "label": b.column("label")})
            # combiner: one MIN per (batch, node) before the shuffle
            return t.group_by(["node"]).aggregate([("label", "min")]).rename_columns(["node", "label"])

        both = labels.union(msgs.map_batches(to_msgs, batch_format="pyarrow"))
        labels = both.groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def components_local(edge_pairs: list[tuple[str, str]]) -> dict[str, int]:
    """Union-find reference (tests): node → min-label of its component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_nodes: dict[str, list[str]] = {}
    for n in list(parent):
        comp_nodes.setdefault(find(n), []).append(n)
    out: dict[str, int] = {}
    for nodes in comp_nodes.values():
        lab = int(_label_of(nodes).min())
        for n in nodes:
            out[n] = lab
    return out
