"""Iterative graph algorithms over the materialized adjacency (A19
output): connected components via min-label propagation, PageRank.

TWO REGIMES, chosen by node count (the broadcast-vs-shuffle join rule
applied to iteration state):

- ``n_nodes > SMALL_GRAPH_NODES`` — the canonical Pregel-on-a-Dataset
  loop: per iteration one hash join (state → edge endpoints) and one
  grouped MIN/SUM — key-partitioned exchanges, no driver-side graph.
  The per-iteration state table (one row per node) is materialized: it
  is node-scale, not edge-scale, and feeding a lazy 10-join lineage
  into iteration N would re-execute every earlier round per consumer.
  Partitioning assumption: state and messages shuffle on node id;
  skewed high-degree nodes cost one reducer their in-degree in messages
  per iteration (pre-aggregated per batch by the combiner before the
  global MIN/SUM, so the wire cost is capped at |distinct dst per
  batch|).

- ``n_nodes <= SMALL_GRAPH_NODES`` — node-scale state (a few MB of
  vectors) is BROADCAST per iteration (``ray.put`` once, read zero-copy
  in every task) while edges stay a distributed Dataset: one
  ``map_batches`` pass emits sparse per-batch partials (unique dst,
  combined value) that the driver folds into the state vector. This
  removes BOTH per-iteration Dataset joins — each join spins up an
  aggregator actor pool whose fixed cost (~seconds) dwarfs the work on
  graphs that are node-small even when the EDGE list is large. Same
  results as the shuffle regime (equivalence-tested); the threshold is
  the point where node-state no longer fits one machine, NOT a
  wall-time crossover (measured at 200k nodes / 1M edges, 32 CPUs:
  PageRank 23 s broadcast vs 84 s shuffle; components 13 s vs 203 s —
  both regimes identical outputs). Driver ingest per round is bounded
  by blocks × |distinct dst per block| (~16 MB × blocks worst case at
  the 1M-node limit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

from ..functions.fold import sum_columns_merge, tree_fold
from ..functions.hashing import stable_u64_array

# Below this node count, iteration state lives in driver/broadcast
# vectors (~16 MB of int64 labels at the limit); above it, state is a
# sharded Dataset and every exchange is a key-partitioned shuffle.
SMALL_GRAPH_NODES = 1_000_000


def _label_of(ids: list[str], key: str = "blake2b") -> np.ndarray:
    # int64-positive stable hash: min() over these is a deterministic
    # component representative (collision odds ~n^2/2^63 — negligible).
    # key="md5" selects the DuckDB-replicable hash (md5_number_lower
    # >> 1; see functions/hashing.md5_u64_array) so label_propagation
    # can run under an exact SQL oracle.
    if key == "md5":
        from ..functions.hashing import md5_u64_array

        return (md5_u64_array(ids) >> np.uint64(1)).astype(np.int64)
    return (stable_u64_array(ids) >> np.uint64(1)).astype(np.int64)


def _collect(ds: ray.data.Dataset) -> pa.Table:
    """Node-scale driver materialization (small regime only)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def _indexed_edges(
    E: ray.data.Dataset,
    nodes_arr: pa.Array,
    ucol: str = "u",
    vcol: str = "v",
    carry: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """(u, v) string edges → (ui, vi) int64 index edges against the
    broadcast node vocabulary — vectorized ``pc.index_in`` per batch,
    shipped once via ``ray.put``. ``carry`` columns (e.g. edge weights)
    pass through untouched. Coalesced to ~2× the shuffle width:
    the iteration loop executes this Dataset once PER ROUND, so paying
    one repartition here cuts per-round task count from |input blocks|
    (e.g. one per adjacency shard file) to a CPU-sized constant."""
    from ..config import shuffle_width

    nodes_ref = ray.put(nodes_arr)

    def to_idx(b: pa.Table) -> pa.Table:
        vocab = ray.get(nodes_ref)
        cols = {
            "ui": pc.cast(pc.index_in(b.column(ucol), value_set=vocab), pa.int64()),
            "vi": pc.cast(pc.index_in(b.column(vcol), value_set=vocab), pa.int64()),
        }
        for c in carry:
            cols[c] = b.column(c)
        return pa.table(cols)

    return (
        E.map_batches(to_idx, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(max(2 * shuffle_width(), 8))
        .materialize()
    )


def _warn_not_converged(which: str, max_iters: int) -> None:
    # No silent caps (same rule as dedup truncation): results are WRONG
    # for components whose diameter exceeds max_iters — say so.
    import logging

    logging.getLogger(__name__).warning(
        "%s did NOT converge within max_iters=%d — some components carry "
        "split labels; raise max_iters (label propagation needs ~graph "
        "diameter rounds)", which, max_iters
    )


def _check_max_iters(max_iters: int) -> None:
    """Iterative ops need >= 1 round: max_iters=0 returned the initial
    state in the small regime and raised UnboundLocalError in the large
    one (ADVICE r3) — fail loudly at entry instead."""
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")


def _components_small(
    und: ray.data.Dataset,
    labels_ds: ray.data.Dataset,
    max_iters: int,
    checkpoint_dir: str | None = None,
    round0: int = 0,
    n_nodes: int = 0,
) -> ray.data.Dataset:
    """Small regime: label vector broadcast per round, edges distributed.

    Each round is one map_batches over the (index-encoded, materialized)
    edge list emitting sparse (dst, min incoming label) partials — the
    same per-batch MIN combiner as the shuffle regime — folded into the
    label vector driver-side with ``np.minimum.at``. Convergence is an
    EXACT vector comparison per round."""
    lab_tbl = _collect(labels_ds)
    nodes_arr = lab_tbl.column("node").combine_chunks()
    labels = lab_tbl.column("label").to_numpy(zero_copy_only=False).copy()
    E_idx = _indexed_edges(und, nodes_arr)
    converged = False
    for it in range(max_iters):
        lab_ref = ray.put(labels)

        def min_partial(b: pa.Table, _ref=lab_ref) -> pa.Table:
            lab = ray.get(_ref)
            ui = b.column("ui").to_numpy(zero_copy_only=False)
            vi = b.column("vi").to_numpy(zero_copy_only=False)
            uv, inv = np.unique(vi, return_inverse=True)
            m = np.full(len(uv), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(m, inv, lab[ui])
            return pa.table({"ci": pa.array(uv, pa.int64()), "m": pa.array(m, pa.int64())})

        new = labels.copy()
        for part in ray.get(
            E_idx.map_batches(min_partial, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
        ):
            if part.num_columns == 0 or part.num_rows == 0:
                continue
            ci = part.column("ci").to_numpy(zero_copy_only=False)
            m = part.column("m").to_numpy(zero_copy_only=False)
            np.minimum.at(new, ci, m)
        done = np.array_equal(new, labels)
        labels = new
        if checkpoint_dir is not None:
            _ckpt_write(
                checkpoint_dir,
                round0 + it + 1,
                ray.data.from_arrow(
                    pa.table({"node": nodes_arr, "label": pa.array(labels, pa.int64())})
                ),
                {"n_nodes": n_nodes or len(labels)},
            )
        if done:
            converged = True
            break
    if not converged:
        _warn_not_converged("connected_components", max_iters)
    return ray.data.from_arrow(
        pa.table({"node": nodes_arr, "label": pa.array(labels, pa.int64())})
    )


def _pagerank_small(
    E: ray.data.Dataset,
    nodes_ds: ray.data.Dataset,
    degrees_ds: ray.data.Dataset,
    n: int,
    damping: float,
    iters: int,
    personalization: list[str] | None = None,
) -> ray.data.Dataset:
    """Small regime: rank/degree vectors broadcast per round, edges
    distributed. Per round one map_batches over the index-encoded edge
    list emits sparse (dst, summed contribution) partials — the same
    per-batch SUM combiner as the shuffle regime — accumulated into the
    rank vector driver-side. Identical update rule to the shuffle
    regime (teleport/dangling mass goes to the restart distribution r0
    — uniform for classic PageRank, uniform-over-seeds when
    personalized; ranks sum to 1)."""
    node_col = _collect(nodes_ds).column("node").combine_chunks()
    nodes_arr = node_col.take(pc.sort_indices(node_col))  # deterministic index
    deg = np.zeros(n, dtype=np.float64)
    deg_tbl = _collect(degrees_ds)
    if deg_tbl.num_rows:
        pos = pc.index_in(deg_tbl.column("dnode").combine_chunks(), value_set=nodes_arr)
        deg[pos.to_numpy(zero_copy_only=False)] = (
            deg_tbl.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        )
    if personalization is None:
        r0 = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        seed_mask = pc.is_in(
            nodes_arr, value_set=pa.array(sorted(set(personalization)), pa.string())
        ).to_numpy(zero_copy_only=False)
        n_seeds = int(seed_mask.sum())
        if n_seeds == 0:
            raise ValueError("pagerank: no personalization seed appears in the graph")
        r0 = seed_mask.astype(np.float64) / n_seeds
    E_idx = _indexed_edges(E, nodes_arr)
    rank = r0.copy()
    safe_deg = np.where(deg > 0, deg, 1.0)
    for _ in range(iters):
        dangling = float(rank[deg == 0.0].sum())
        share_ref = ray.put(np.where(deg > 0, rank / safe_deg, 0.0))

        def contrib_partial(b: pa.Table, _ref=share_ref) -> pa.Table:
            s = ray.get(_ref)
            ui = b.column("ui").to_numpy(zero_copy_only=False)
            vi = b.column("vi").to_numpy(zero_copy_only=False)
            uv, inv = np.unique(vi, return_inverse=True)
            c = np.bincount(inv, weights=s[ui])
            return pa.table({"ci": pa.array(uv, pa.int64()), "c": pa.array(c, pa.float64())})

        acc = np.zeros(n, dtype=np.float64)
        for part in ray.get(
            E_idx.map_batches(
                contrib_partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ):
            if part.num_columns == 0 or part.num_rows == 0:
                continue
            np.add.at(
                acc,
                part.column("ci").to_numpy(zero_copy_only=False),
                part.column("c").to_numpy(zero_copy_only=False),
            )
        rank = (1.0 - damping + damping * dangling) * r0 + damping * acc
    return ray.data.from_arrow(
        pa.table({"node": nodes_arr, "rank": pa.array(rank, pa.float64())})
    )


def connected_components(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """(node, component) for every node in the edge list.

    ``component`` is the minimum node-label hash in the node's connected
    component (undirected reachability regardless of edge direction).

    ``checkpoint_dir`` makes the loop RESUMABLE: each round's node-scale
    label table commits atomically (state dir + meta pointer), and a
    re-run with the same dir continues from the last committed round
    instead of round 0 — at 100 TB an iterative graph job runs hours,
    and min-propagation is monotone + idempotent, so resuming from ANY
    committed round reaches the identical fixpoint (equality-tested
    against an uninterrupted run). ``max_iters`` counts iterations per
    CALL. The node universe is fingerprinted (n_nodes) and asserted on
    resume."""
    _check_max_iters(max_iters)

    def undirect(b: pa.Table) -> pa.Table:
        # Columnar symmetrization: concat the two columns both ways —
        # no Python list materialization (VERDICT r2 item #8).
        s = b.column(src_col).combine_chunks()
        d = b.column(dst_col).combine_chunks()
        return pa.table(
            {
                "u": pa.concat_arrays([s.cast(pa.string()), d.cast(pa.string())]),
                "v": pa.concat_arrays([d.cast(pa.string()), s.cast(pa.string())]),
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
    n_nodes = labels.count()
    if n_nodes == 0:
        return labels
    round0 = 0
    if checkpoint_dir is not None:
        ck = _ckpt_load(checkpoint_dir)
        if ck is not None:
            meta, state_path = ck
            if meta.get("n_nodes") != n_nodes:
                raise ValueError(
                    f"connected_components: checkpoint at {checkpoint_dir} was "
                    f"written for n_nodes={meta.get('n_nodes')}, input has "
                    f"{n_nodes} — refusing to resume across a different graph"
                )
            labels = ray.data.read_parquet(state_path).materialize()
            round0 = int(meta["round"])
    if n_nodes <= small_graph_nodes:
        return _components_small(
            und, labels, max_iters, checkpoint_dir=checkpoint_dir,
            round0=round0, n_nodes=n_nodes,
        )
    from ..config import shuffle_width

    nparts = shuffle_width()
    # Ray 2.49 hash aggregates emit zero-COLUMN blocks for empty hash
    # partitions and a later join rejects them ("no match for key
    # field") — repartition BOTH join inputs to concatenate blocks and
    # restore the schema (the same load-bearing guard as bfs_depth /
    # shortest_path; also restores checkpointed labels' raw parquet
    # blocks to the shuffle-friendly layout).
    labels = labels.repartition(nparts).materialize()
    und = und.repartition(nparts).materialize()

    def checksum(ds: ray.data.Dataset) -> int:
        """EXACT arbitrary-precision label sum (one cheap aggregate).

        A plain int64 Sum wraps: labels range up to 2^62, so any
        realistic graph overflows and convergence would rest on
        wrapped-sum equality. Instead each batch emits four partial sums
        of 16-bit label slices (each partial ≤ rows·2^16, so the global
        int64 Sums stay exact up to ~2^47 rows — far past 10^12 nodes),
        recombined as Python ints on the driver. Min-propagation makes
        the true sum strictly decrease until the fixpoint, so exact
        equality IS convergence."""
        import numpy as np
        from ray.data.aggregate import Sum

        def parts(b: pa.Table) -> pa.Table:
            lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    f"p{k}": pa.array(
                        [int(((lab >> np.uint64(16 * k)) & np.uint64(0xFFFF)).sum())],
                        pa.int64(),
                    )
                    for k in range(4)
                }
            )

        agg = ds.map_batches(parts, batch_format="pyarrow", zero_copy_batch=True).aggregate(
            *[Sum(f"p{k}", alias_name=f"p{k}") for k in range(4)]
        )
        return sum(int(agg[f"p{k}"]) << (16 * k) for k in range(4))

    prev = checksum(labels)
    converged = False
    for it in range(max_iters):
        # message pass: each edge (u, v) sends u's current label to v.
        msgs = und.join(
            labels, join_type="inner", num_partitions=nparts, on=("u",), right_on=("node",)
        )

        def to_msgs(b: pa.Table) -> pa.Table:
            t = pa.table({"node": b.column("v"), "label": b.column("label")})
            # combiner: one MIN per (batch, node) before the shuffle
            return t.group_by(["node"]).aggregate([("label", "min")]).rename_columns(["node", "label"])

        both = labels.union(msgs.map_batches(to_msgs, batch_format="pyarrow"))
        labels = (
            both.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(nparts)  # zero-column-block guard (see above)
            .materialize()
        )
        if checkpoint_dir is not None:
            _ckpt_write(checkpoint_dir, round0 + it + 1, labels, {"n_nodes": n_nodes})
        cur = checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        _warn_not_converged("connected_components", max_iters)
    return labels


def pagerank(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    personalization: list[str] | None = None,
) -> ray.data.Dataset:
    """PageRank over a directed edge list: (node, rank) after ``iters``
    power iterations. ``personalization`` switches the restart
    distribution r0 from uniform to uniform-over-seeds (personalized
    PageRank: teleports land only on the seeds, so rank measures
    proximity to them); dangling mass follows r0 in both modes, so
    ranks sum to 1 every round either way.

    The rank table permanently carries the (static) out-degree AND its
    r0 entry, so each iteration costs exactly ONE hash join (edge
    sources ← shares), one grouped SUM of contributions (combined per
    batch first), and one left-outer update join — the
    Pregel-on-a-Dataset shape shared with :func:`connected_components`.
    Float sums are shuffle-order-dependent in the last ulps; compare
    with tolerance (tests use a dense numpy reference).
    """
    _check_max_iters(iters)
    from ray.data.aggregate import Count, Sum

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table({"u": b.column(src_col), "v": b.column(dst_col)})

    E = edges.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def node_rows(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in (b.column("u"), b.column("v"))]
        )
        t = pa.table({"node": both})
        return t.group_by(["node"]).aggregate([]).rename_columns(["node"])

    nodes = (
        E.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )

    def outdeg_rows(b: pa.Table) -> pa.Table:
        t = pa.table({"dnode": b.column("u")})
        return t.group_by(["dnode"]).aggregate([([], "count_all")]).rename_columns(["dnode", "deg"])

    degrees = (
        E.map_batches(outdeg_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dnode")
        .aggregate(Sum("deg", alias_name="deg"))
    )
    if n_nodes <= small_graph_nodes:
        return _pagerank_small(E, nodes, degrees, n_nodes, damping, iters, personalization)
    from ..config import shuffle_width

    nparts = shuffle_width()
    # zero-column-block guard: nodes and degrees are hash-aggregate
    # outputs and BOTH sides of the rank-init join below — empty hash
    # partitions emit schemaless blocks that only a full repartition
    # concatenation heals (aggregates/map_groups tolerate them; joins
    # do not — measured, see connected_components).
    nodes = nodes.repartition(nparts).materialize()
    degrees = degrees.repartition(nparts).materialize()
    if personalization is None:
        seed_ref = None
        n_seeds = n_nodes
    else:
        seed_arr = pa.array(sorted(set(personalization)), pa.string())
        # seed count restricted to nodes actually in the graph — r0
        # must sum to 1 over the node universe
        def seed_partial(b: pa.Table) -> pa.Table:
            m = pc.is_in(b.column("node"), value_set=seed_arr)
            return pa.table({"s": pa.array([int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)], pa.int64())})

        n_seeds = sum(
            p["s"]
            for p in tree_fold(
                nodes.map_batches(seed_partial, batch_format="pyarrow"),
                sum_columns_merge,
            )
        )
        if n_seeds == 0:
            raise ValueError("pagerank: no personalization seed appears in the graph")
        seed_ref = ray.put(seed_arr)

    def init_rank(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        deg = pc.fill_null(pc.cast(b.column("deg"), pa.float64()), 0.0)
        if seed_ref is None:
            r0 = pa.array(np.full(b.num_rows, 1.0 / n_nodes), pa.float64())
        else:
            sa = ray.get(seed_ref) if isinstance(seed_ref, ray.ObjectRef) else seed_ref
            m = pc.is_in(b.column("node"), value_set=sa)
            r0 = pc.if_else(m, pa.scalar(1.0 / n_seeds), pa.scalar(0.0))
        return pa.table(
            {
                "node": b.column("node"),
                "deg": deg,
                "r0": r0,
                "rank": r0,
            }
        )

    # The rank table carries out-degree from the start (one join, done
    # once — degree is static). The repartition after every join+map is
    # load-bearing, not cosmetic: Ray 2.49 join outputs contain
    # zero-COLUMN empty blocks for empty hash partitions, map_batches
    # passes them through untouched (the UDF never runs on them), and
    # feeding such a block to a later join fails with "no match for key
    # field on right side". One repartition concatenates blocks and
    # restores the schema.
    ranks = (
        nodes.join(degrees, join_type="left_outer", num_partitions=nparts, on=("node",), right_on=("dnode",))
        .map_batches(init_rank, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(nparts)
        .materialize()
    )
    for _ in range(iters):
        # Dangling mass (nodes with no out-edges) — a tiny global agg.
        def dangling_partial(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.equal(b.column("deg"), 0.0)
            r = pc.sum(pc.if_else(m, b.column("rank"), pa.scalar(0.0))).as_py() or 0.0
            return pa.table({"d": pa.array([float(r)], pa.float64())})

        dangling = sum(
            p["d"] for p in ranks.map_batches(dangling_partial, batch_format="pyarrow").take_all()
        )

        def to_share(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            deg = b.column("deg")
            share = pc.if_else(
                pc.equal(deg, 0.0), pa.scalar(0.0), pc.divide(b.column("rank"), deg)
            )
            return pa.table({"snode": b.column("node"), "share": share})

        share = ranks.map_batches(to_share, batch_format="pyarrow", zero_copy_batch=True)
        msgs = E.join(share, join_type="inner", num_partitions=nparts, on=("u",), right_on=("snode",))

        def contrib(b: pa.Table) -> pa.Table:
            t = pa.table({"cnode": b.column("v"), "c": b.column("share")})
            return t.group_by(["cnode"]).aggregate([("c", "sum")]).rename_columns(["cnode", "c"])

        contribs = (
            msgs.map_batches(contrib, batch_format="pyarrow")
            .groupby("cnode")
            .aggregate(Sum("c", alias_name="c"))
            # zero-column-block guard: this hash-aggregate output is the
            # RIGHT side of the join below; an empty hash partition's
            # schemaless block would fail the key-field lookup.
            .repartition(nparts)
        )
        # per-row base: teleport + dangling mass land on r0 (uniform →
        # the classic scalar; personalized → only on seeds)
        base_coef = 1.0 - damping + damping * dangling

        def apply_rank(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.fill_null(b.column("c"), 0.0)
            r = pc.add(
                pc.multiply(c, pa.scalar(damping)),
                pc.multiply(b.column("r0"), pa.scalar(base_coef)),
            )
            return pa.table(
                {
                    "node": b.column("node"),
                    "deg": b.column("deg"),
                    "r0": b.column("r0"),
                    "rank": r,
                }
            )

        joined = ranks.join(
            contribs, join_type="left_outer", num_partitions=nparts, on=("node",), right_on=("cnode",)
        )
        ranks = (
            joined.map_batches(apply_rank, batch_format="pyarrow")
            .repartition(nparts)
            .materialize()
        )

    def final(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"), "rank": b.column("rank")})

    return ranks.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def pagerank_local(
    edge_pairs: list[tuple[str, str]],
    damping: float = 0.85,
    iters: int = 10,
    personalization: list[str] | None = None,
) -> dict[str, float]:
    """Dense numpy reference (tests)."""
    nodes = sorted({n for e in edge_pairs for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for a, b in edge_pairs:
        out.setdefault(idx[a], []).append(idx[b])
    if personalization is None:
        r0 = np.full(n, 1.0 / n)
    else:
        seeds = [idx[s] for s in set(personalization) if s in idx]
        r0 = np.zeros(n)
        r0[seeds] = 1.0 / len(seeds)
    r = r0.copy()
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            targets = out.get(u)
            if not targets:
                dangling += r[u]
                continue
            share = r[u] / len(targets)
            for v in targets:
                nxt[v] += share
        r = (1.0 - damping + damping * dangling) * r0 + damping * nxt
    return {nodes[i]: float(r[i]) for i in range(n)}


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


# ------------------------------------------------------- triangle counting

def triangle_count(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
) -> int:
    """Exact triangle count of the undirected graph (self-loops and
    duplicate/reverse edges collapsed first).

    The classic degree-ordered wedge join: every edge is oriented from
    its lower-(degree, id) endpoint to the higher one, so each node's
    out-neighborhood is O(sqrt(m)) and total wedge volume is bounded by
    m^1.5 instead of sum(deg^2) — the orientation is what makes hub
    nodes survivable. Wedges (pairs of one node's out-neighbors) then
    co-shuffle with the canonical edge set on hash(a, b) % SHARDS and
    one vectorized run-detection pass per shard counts the wedges whose
    closing edge exists. No per-node or per-wedge Python: out-neighbor
    pair expansion is the repeat/offset-range trick, matching is a
    lexsort + run mask.

    Degrees ride along as broadcast node-scale state (same regime rule
    as components/pagerank: fine below SMALL_GRAPH_NODES; above it the
    degree attach becomes one more key-partitioned join)."""
    from ..functions.hashing import polars_u64
    from ..stages.dedup import SHARDS, _key_runs

    def canon(b: pa.Table) -> pa.Table:
        s = _label_of(b.column(src_col).to_pylist())
        d = _label_of(b.column(dst_col).to_pylist())
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        keep = lo != hi
        t = pa.table({"a": pa.array(lo[keep], pa.int64()), "b": pa.array(hi[keep], pa.int64())})
        return (
            t.group_by(["a", "b"]).aggregate([([], "count_all")]).select(["a", "b"])
        )

    E = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Min("a", alias_name="_drop"))
        .select_columns(["a", "b"])
        .materialize()
    )

    def deg_partial(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [b.column("a").combine_chunks(), b.column("b").combine_chunks()]
        )
        t = pa.table({"node": both})
        g = t.group_by("node").aggregate([([], "count_all")])
        return g.rename_columns(["node", "cnt"])

    from ray.data.aggregate import Sum

    deg_tbl = _collect(
        E.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Sum("cnt", alias_name="deg"))
    )
    if deg_tbl.num_columns == 0 or deg_tbl.num_rows == 0:
        return 0
    nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False)
    degs = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
    o = np.argsort(nodes)
    nodes, degs = nodes[o], degs[o]
    deg_ref = ray.put((nodes, degs))

    class OrientEmit:
        """Orient each edge low→high by (degree, id); key rows for the
        wedge stage by the SOURCE node."""

        def __init__(self, ref):
            self.nodes, self.degs = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            a = b.column("a").to_numpy(zero_copy_only=False)
            bb = b.column("b").to_numpy(zero_copy_only=False)
            da = self.degs[np.searchsorted(self.nodes, a)]
            db = self.degs[np.searchsorted(self.nodes, bb)]
            swap = (db < da) | ((db == da) & (bb < a))
            u = np.where(swap, bb, a)
            w = np.where(swap, a, bb)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "w": pa.array(w, pa.int64()),
                    "shard": pa.array(
                        ((u.astype(np.uint64) >> np.uint64(1)) % np.uint64(SHARDS)).astype(
                            np.int32
                        ),
                        pa.int32(),
                    ),
                }
            )

    oriented = E.map_batches(
        OrientEmit,
        fn_constructor_args=(deg_ref,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def wedges_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "side": pa.array([], pa.int8())}
        )
        if g.num_rows < 2:
            return empty
        u = g.column("u").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        o = np.lexsort((w, u))
        u, w = u[o], w[o]
        starts, ends = _key_runs(u)
        # per row: pairs with every LATER out-neighbor in its run
        counts = np.repeat(ends, ends - starts) - np.arange(len(u)) - 1
        total = int(counts.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(len(u)), counts)
        right = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts) + left + 1
        v1, v2 = w[left], w[right]
        return pa.table(
            {
                "a": pa.array(np.minimum(v1, v2), pa.int64()),
                "b": pa.array(np.maximum(v1, v2), pa.int64()),
                "side": pa.array(np.ones(total, np.int8), pa.int8()),
            }
        )

    wedges = oriented.groupby("shard").map_groups(wedges_shard, batch_format="pyarrow")

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": b.column("a"),
                "b": b.column("b"),
                "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            }
        )

    def add_pair_shard(b: pa.Table) -> pa.Table:
        key = polars_u64(b.column("a").combine_chunks()) ^ (
            polars_u64(b.column("b").combine_chunks()) * np.uint64(0x9E3779B97F4A7C15)
        )
        return b.append_column(
            "pshard", pa.array((key % np.uint64(SHARDS)).astype(np.int32), pa.int32())
        )

    both = (
        wedges.union(E.map_batches(tag_edges, batch_format="pyarrow", zero_copy_batch=True))
        .map_batches(add_pair_shard, batch_format="pyarrow", zero_copy_batch=True)
    )

    def count_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        o = np.lexsort((side, b, a))
        a, b, side = a[o], b[o], side[o]
        boundary = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.nonzero(boundary)[0]
        ends = np.r_[starts[1:], len(a)]
        has_edge = side[starts] == 0  # side sorts edges (0) first in a run
        wedge_counts = (ends - starts) - has_edge.astype(np.int64)
        n = int((wedge_counts * has_edge).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    partials = _collect(both.groupby("pshard").map_groups(count_shard, batch_format="pyarrow"))
    if partials.num_columns == 0:
        return 0
    return int(pc.sum(partials.column("n")).as_py() or 0)


# ----------------------------------------------------------------- k-core

def kcore(
    edges: ray.data.Dataset,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 50,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> ray.data.Dataset:
    """Nodes of the k-core: the maximal induced subgraph in which every
    node keeps degree ≥ k (simple-graph semantics: undirected, self
    loops dropped, parallel edges collapsed). Returns a one-column
    (node) Dataset.

    Parallel peeling: each round recomputes degrees over the currently
    alive induced subgraph and drops every node below k — equivalent to
    sequential peeling, in ≤ peel-depth rounds. Two regimes, same split
    as :func:`connected_components`:

    - small (≤ ``small_graph_nodes``): the alive bitmap broadcasts per
      round; one map_batches over the index-encoded edge list emits
      sparse per-batch degree partials folded driver-side. State is
      node-scale, edges stay distributed and are scanned once a round.
    - large: alive is a Dataset; each round is two semi joins (edges ⋉
      alive on u, then on v) + one grouped Count + a filter, all
      key-partitioned shuffles. Convergence = alive count unchanged
      (strictly decreasing otherwise, so equality is exact).
    """
    _check_max_iters(max_iters)
    from ray.data.aggregate import Count

    def undirect_simple(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks().cast(pa.string())
        d = b.column(dst_col).combine_chunks().cast(pa.string())
        t = pa.table(
            {
                "u": pa.concat_arrays([s, d]),
                "v": pa.concat_arrays([d, s]),
            }
        ).filter(pc.not_equal(pc.field("u"), pc.field("v")))
        # local pair dedup (combiner); the groupby below makes it global
        return t.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    und = (
        edges.map_batches(undirect_simple, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["u", "v"])
        .materialize()
    )
    empty = ray.data.from_arrow(pa.table({"node": pa.array([], pa.string())}))
    if und.count() == 0:
        return empty

    nodes_tbl = _collect(und.groupby("u").aggregate(Count(alias_name="_d")))
    n_nodes = nodes_tbl.num_rows

    if n_nodes <= small_graph_nodes:
        nodes_arr = nodes_tbl.column("u").combine_chunks()
        E_idx = _indexed_edges(und, nodes_arr)
        alive = np.ones(n_nodes, dtype=bool)
        converged = False
        for _ in range(max_iters):
            a_ref = ray.put(alive)

            def deg_partial(b: pa.Table, _ref=a_ref) -> pa.Table:
                a = ray.get(_ref)
                ui = b.column("ui").to_numpy(zero_copy_only=False)
                vi = b.column("vi").to_numpy(zero_copy_only=False)
                m = a[ui] & a[vi]
                uq, cnt = np.unique(ui[m], return_counts=True)
                return pa.table(
                    {"ni": pa.array(uq, pa.int64()), "d": pa.array(cnt, pa.int64())}
                )

            deg = np.zeros(n_nodes, dtype=np.int64)
            for part in ray.get(
                E_idx.map_batches(
                    deg_partial, batch_format="pyarrow", zero_copy_batch=True
                ).to_arrow_refs()
            ):
                if part.num_columns == 0 or part.num_rows == 0:
                    continue
                np.add.at(
                    deg,
                    part.column("ni").to_numpy(zero_copy_only=False),
                    part.column("d").to_numpy(zero_copy_only=False),
                )
            new_alive = alive & (deg >= k)
            if np.array_equal(new_alive, alive):
                converged = True
                break
            alive = new_alive
        if not converged:
            _warn_not_converged("kcore", max_iters)
        if not alive.any():
            return empty
        return ray.data.from_arrow(
            pa.table({"node": nodes_arr.filter(pa.array(alive))})
        )

    from ..config import shuffle_width

    nparts = shuffle_width()
    # zero-column-block guard: und is a hash-aggregate output and the
    # LEFT side of iteration 1's join (joins choke on the schemaless
    # blocks empty hash partitions emit; filter/aggregate tolerate
    # them). Rebind und so the superseded materialized copy is GC'd
    # instead of pinning a second full edge list for the whole loop.
    und = und.repartition(nparts).materialize()
    E = und
    n_alive = n_nodes
    converged = False
    for _ in range(max_iters):
        alive = (
            E.groupby("u")
            .aggregate(Count(alias_name="_d"))
            .filter(expr=f"_d >= {int(k)}")
            .select_columns(["u"])
            # zero-column-block guard: alive is the RIGHT side of both
            # induced-subgraph joins below.
            .repartition(nparts)
            .materialize()
        )
        cur = alive.count()
        if cur == 0:
            return empty
        if cur == n_alive:
            converged = True
            break
        n_alive = cur
        # induced subgraph: keep edges whose BOTH endpoints survive
        E = (
            E.join(alive, join_type="inner", num_partitions=nparts, on=("u",))
            # zero-column-block guard: the first join's output is the
            # LEFT side of the second (join→join chains fail the same
            # way — measured), and the chain's output is next
            # iteration's join input.
            .repartition(nparts)
            .join(
                alive.rename_columns({"u": "v"}),
                join_type="inner",
                num_partitions=nparts,
                on=("v",),
            )
            .select_columns(["u", "v"])
            .repartition(nparts)
            .materialize()
        )
    if not converged:
        _warn_not_converged("kcore", max_iters)
    return alive.rename_columns({"u": "node"})


# ------------------------------------------------- label propagation (LPA)

def _labelprop_small(
    und: ray.data.Dataset, nodes_arr: pa.Array, max_iters: int, label_key: str = "blake2b"
) -> tuple[np.ndarray, bool]:
    """Small regime: the label vector broadcasts per round; one
    map_batches over the index-encoded edges emits sparse per-batch
    (dst, neighbor-label, count) vote partials; the driver merges them
    with one lexsort + reduceat and picks each node's winner (max
    count, tie-broken on min label) fully vectorized."""
    labels = _label_of(nodes_arr.to_pylist(), key=label_key)
    E_idx = _indexed_edges(und, nodes_arr)
    for _ in range(max_iters):
        lab_ref = ray.put(labels)

        def vote_partial(b: pa.Table, _ref=lab_ref) -> pa.Table:
            lab = ray.get(_ref)
            ui = b.column("ui").to_numpy(zero_copy_only=False)
            vi = b.column("vi").to_numpy(zero_copy_only=False)
            lv = lab[ui]
            order = np.lexsort((lv, vi))
            vi_s, lv_s = vi[order], lv[order]
            is_start = np.r_[True, (vi_s[1:] != vi_s[:-1]) | (lv_s[1:] != lv_s[:-1])]
            starts = np.nonzero(is_start)[0]
            cnt = np.diff(np.r_[starts, len(vi_s)])
            return pa.table(
                {
                    "ni": pa.array(vi_s[starts], pa.int64()),
                    "l": pa.array(lv_s[starts], pa.int64()),
                    "c": pa.array(cnt, pa.int64()),
                }
            )

        ni_p, l_p, c_p = [], [], []
        for part in ray.get(
            E_idx.map_batches(
                vote_partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        ):
            if part.num_columns == 0 or part.num_rows == 0:
                continue
            ni_p.append(part.column("ni").to_numpy(zero_copy_only=False))
            l_p.append(part.column("l").to_numpy(zero_copy_only=False))
            c_p.append(part.column("c").to_numpy(zero_copy_only=False))
        if not ni_p:
            return labels, True  # no edges — trivially converged
        ni = np.concatenate(ni_p)
        l = np.concatenate(l_p)
        c = np.concatenate(c_p)
        # global (node, label) totals
        order = np.lexsort((l, ni))
        ni, l, c = ni[order], l[order], c[order]
        is_start = np.r_[True, (ni[1:] != ni[:-1]) | (l[1:] != l[:-1])]
        starts = np.nonzero(is_start)[0]
        ni, l = ni[starts], l[starts]
        c = np.add.reduceat(c, starts)
        # per-node winner: max count, tie-break min label
        order2 = np.lexsort((l, -c, ni))
        ni, l = ni[order2], l[order2]
        win = np.nonzero(np.r_[True, ni[1:] != ni[:-1]])[0]
        new = labels.copy()
        new[ni[win]] = l[win]
        if np.array_equal(new, labels):
            return labels, True
        labels = new
    return labels, False


def label_propagation(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 10,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    label_key: str = "blake2b",
) -> ray.data.Dataset:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007, arXiv:0709.2938), made DETERMINISTIC: every node
    starts with its own hash label and each round adopts the most
    frequent label among its neighbors, ties broken on the SMALLEST
    label (the paper breaks ties randomly; a deterministic rule keeps
    the operator partition-invariant and resumable). Nodes with no
    neighbors keep their own label. Returns (node, label) — nodes
    sharing a label after convergence form one community.

    Undirected simple-graph semantics (self loops dropped, parallel
    edges collapsed) — same normalization as :func:`kcore`. Synchronous
    LPA can oscillate on bipartite-ish structures, so non-convergence
    within ``max_iters`` is loudly logged, never silent.

    Two regimes, same split as the other iterative algos:

    - small (≤ ``small_graph_nodes``): label vector broadcast per
      round, edges distributed; per-batch vote-count partials merged
      driver-side (one lexsort + reduceat, no per-node Python).
    - large: labels stay a Dataset. Each round: one hash join ships
      labels onto edges, a per-batch (node, label, count) combiner
      caps the vote shuffle, a grouped Sum makes votes global, and a
      SHARDED pick stage (node-hash % SHARDS, one Python call per
      shard, vectorized run detection inside — the dedup.py SHARDS
      pattern) selects each node's winner. Self rows ride the same
      stream with count = -1, so the pick also emits a per-node
      ``changed`` bit and convergence is an exact Sum(changed) == 0 —
      no extra join, no checksum heuristics.

    ``label_key`` selects the initial-label hash: ``"blake2b"``
    (default, stable_u64_array) or ``"md5"`` — md5_number_lower >> 1,
    the DuckDB-replicable hash, used by the oracle-backed kg_label_prop
    (the kg_harmonic landmark_key precedent). The dynamics are
    identical; only the arbitrary initial labels (and hence community
    REPRESENTATIVES, not membership structure) differ.
    """
    _check_max_iters(max_iters)
    if label_key not in ("blake2b", "md5"):
        raise ValueError(f"label_propagation: unknown label_key {label_key!r}")
    from ray.data.aggregate import Count, Min, Sum

    def undirect_simple(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks().cast(pa.string())
        d = b.column(dst_col).combine_chunks().cast(pa.string())
        t = pa.table(
            {
                "u": pa.concat_arrays([s, d]),
                "v": pa.concat_arrays([d, s]),
            }
        ).filter(pc.not_equal(pc.field("u"), pc.field("v")))
        return t.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    und = (
        edges.map_batches(undirect_simple, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["u", "v"])
        .materialize()
    )
    if und.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "label": pa.array([], pa.int64())})
        )

    nodes_tbl = _collect(und.groupby("u").aggregate(Count(alias_name="_d")))
    n_nodes = nodes_tbl.num_rows
    nodes_arr = nodes_tbl.column("u").combine_chunks()

    if n_nodes <= small_graph_nodes:
        labels, converged = _labelprop_small(und, nodes_arr, max_iters, label_key)
        if not converged:
            _warn_not_converged("label_propagation", max_iters)
        return ray.data.from_arrow(
            pa.table({"node": nodes_arr, "label": pa.array(labels, pa.int64())})
        )

    from ..config import shuffle_width

    nparts = shuffle_width()
    # zero-column-block guard: und is a hash-aggregate output and the
    # LEFT side of every round's join; repartition once (loop-invariant).
    und = und.repartition(nparts).materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        ids = b.column("u").to_pylist()
        return pa.table(
            {"node": b.column("u"), "label": pa.array(_label_of(ids, key=label_key), pa.int64())}
        )

    labels = (
        und.map_batches(init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        # zero-column-block guard: these initial labels are the RIGHT
        # side of round 1's join (later rounds flow through _pick_shard,
        # whose empty-group table carries the full schema).
        .repartition(nparts)
        .materialize()
    )

    from .dedup import SHARDS

    def _pick_shard(group: pa.Table) -> pa.Table:
        """One node shard: rows (node, label, c) where c = -1 marks the
        node's CURRENT label and c ≥ 1 a vote total. Winner per node =
        max positive c, tie min label; no votes → keep current."""
        empty = pa.table(
            {
                "node": pa.array([], pa.string()),
                "label": pa.array([], pa.int64()),
                "changed": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        node = group.column("node").combine_chunks()
        idx = pc.sort_indices(
            group, sort_keys=[("node", "ascending"), ("c", "descending"), ("label", "ascending")]
        )
        node = node.take(idx)
        lab = group.column("label").combine_chunks().take(idx).to_numpy(zero_copy_only=False)
        c = group.column("c").combine_chunks().take(idx).to_numpy(zero_copy_only=False)
        n = len(lab)
        same_as_prev = pc.equal(node.slice(1), node.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        ) if n > 1 else np.empty(0, dtype=bool)
        is_start = np.r_[True, ~same_as_prev]
        starts = np.nonzero(is_start)[0]
        run_id = np.cumsum(is_start) - 1
        old = np.empty(len(starts), dtype=np.int64)
        self_rows = np.nonzero(c == -1)[0]
        old[run_id[self_rows]] = lab[self_rows]
        new = np.where(c[starts] >= 1, lab[starts], old)
        return pa.table(
            {
                "node": node.take(pa.array(starts)),
                "label": pa.array(new, pa.int64()),
                "changed": pa.array((new != old).astype(np.int64), pa.int64()),
            }
        )

    def _add_nshard(b: pa.Table) -> pa.Table:
        from ..functions.hashing import polars_u64

        h = polars_u64(b.column("node").combine_chunks())
        return b.append_column(
            "nshard", pa.array((h % np.uint64(SHARDS)).astype(np.int32), pa.int32())
        )

    converged = False
    for _ in range(max_iters):
        msgs = und.join(
            labels, join_type="inner", num_partitions=nparts, on=("u",), right_on=("node",)
        )

        def to_votes(b: pa.Table) -> pa.Table:
            t = pa.table({"node": b.column("v"), "label": b.column("label")})
            # combiner: per-batch (node, label) counts cap the shuffle
            t = t.group_by(["node", "label"]).aggregate([([], "count_all")])
            return t.rename_columns(["node", "label", "c"])

        votes = (
            msgs.map_batches(to_votes, batch_format="pyarrow")
            .groupby(["node", "label"])
            .aggregate(Sum("c", alias_name="c"))
        )

        def self_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "label": b.column("label"),
                    "c": pa.array(np.full(b.num_rows, -1, dtype=np.int64), pa.int64()),
                }
            )

        tagged = votes.union(labels.map_batches(self_rows, batch_format="pyarrow"))
        picked = (
            tagged.map_batches(_add_nshard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("nshard")
            .map_groups(
                lambda g: _pick_shard(g.drop_columns(["nshard"])), batch_format="pyarrow"
            )
            # zero-column-block guard: map_groups key cardinality is
            # capped at SHARDS (251) while its partition count equals
            # the upstream block count — at cluster block counts empty
            # (schemaless) partitions are guaranteed. Heal ONCE here for
            # both consumers: the changed-count fold below and next
            # round's join right side (labels).
            .repartition(nparts)
            .materialize()
        )
        n_changed = sum(
            int(t.column("changed").to_numpy(zero_copy_only=False).sum())
            for t in ray.get(picked.select_columns(["changed"]).to_arrow_refs())
            if t.num_columns > 0 and t.num_rows > 0
        )
        labels = picked.select_columns(["node", "label"]).materialize()
        if n_changed == 0:
            converged = True
            break
    if not converged:
        _warn_not_converged("label_propagation", max_iters)
    return labels


# ----------------------------------------- multi-source BFS hop depth

BFS_INF = np.int64(1) << 40  # unreached sentinel; +1 per round never wraps


def _exact_depth_sum(ds: ray.data.Dataset, col: str = "depth") -> int:
    """EXACT arbitrary-precision sum of a bounded-nonnegative int column
    (the connected_components checksum trick): four 16-bit-slice partial
    Sums recombined as Python ints, so BFS_INF-scale values cannot wrap
    int64 no matter the node count. Min-propagation makes the true sum
    strictly decrease until the fixpoint — exact equality IS
    convergence."""
    from ray.data.aggregate import Sum

    def parts(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                f"p{k}": pa.array(
                    [int(((v >> np.uint64(16 * k)) & np.uint64(0xFFFF)).sum())],
                    pa.int64(),
                )
                for k in range(4)
            }
        )

    agg = ds.map_batches(parts, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        *[Sum(f"p{k}", alias_name=f"p{k}") for k in range(4)]
    )
    return sum(int(agg[f"p{k}"]) << (16 * k) for k in range(4))


def _bfs_small(
    und: ray.data.Dataset, depth_tbl: pa.Table, max_iters: int
) -> ray.data.Dataset:
    """Small regime: depth vector broadcast per round, edges distributed
    — per-batch sparse (dst, min incoming depth+1) partials folded with
    np.minimum.at, exact vector-equality convergence (the
    _components_small shape with a +1 on the message)."""
    nodes_arr = depth_tbl.column("node").combine_chunks()
    depth = depth_tbl.column("depth").to_numpy(zero_copy_only=False).copy()
    E_idx = _indexed_edges(und, nodes_arr)
    converged = False
    for _ in range(max_iters):
        ref = ray.put(depth)

        def min_partial(b: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)
            ui = b.column("ui").to_numpy(zero_copy_only=False)
            vi = b.column("vi").to_numpy(zero_copy_only=False)
            uv, inv = np.unique(vi, return_inverse=True)
            m = np.full(len(uv), BFS_INF, dtype=np.int64)
            np.minimum.at(m, inv, d[ui] + 1)
            return pa.table({"ci": pa.array(uv, pa.int64()), "m": pa.array(m, pa.int64())})

        new = depth.copy()
        for part in ray.get(
            E_idx.map_batches(min_partial, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
        ):
            if part.num_columns == 0 or part.num_rows == 0:
                continue
            ci = part.column("ci").to_numpy(zero_copy_only=False)
            m = part.column("m").to_numpy(zero_copy_only=False)
            np.minimum.at(new, ci, m)
        if np.array_equal(new, depth):
            converged = True
            break
        depth = new
    if not converged:
        _warn_not_converged("bfs_depth", max_iters)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": nodes_arr,
                "depth": pa.array(np.where(depth >= BFS_INF, -1, depth), pa.int64()),
            }
        )
    )


def bfs_depth(
    edges: ray.data.Dataset,
    seeds: list[str],
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> ray.data.Dataset:
    """(node, depth): undirected hop distance from the NEAREST seed —
    multi-source BFS as min-propagation (depth(v) = min over neighbors
    of depth(u)+1; seeds start at 0). Nodes unreachable from every seed
    return depth = -1. The node universe is the edge endpoints; an
    isolated seed (no incident edge) does not appear. Needs ~eccentricity
    rounds; non-convergence warns loudly like every iterative op here.

    Shuffle regime: per round ONE hash join (edges × depths) + per-batch
    MIN combiner + grouped Min — node-scale state only between rounds;
    convergence via the exact 16-bit-slice depth-sum (strictly decreasing
    under min-propagation). Small regime broadcasts the depth vector."""
    _check_max_iters(max_iters)
    seed_arr = pa.array(sorted(set(seeds)), pa.string())

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks()
        d = b.column(dst_col).combine_chunks()
        return pa.table(
            {
                "u": pa.concat_arrays([s.cast(pa.string()), d.cast(pa.string())]),
                "v": pa.concat_arrays([d.cast(pa.string()), s.cast(pa.string())]),
            }
        )

    und = edges.map_batches(undirect, batch_format="pyarrow", zero_copy_batch=True).materialize()
    seed_ref = ray.put(seed_arr)

    def init_depth(b: pa.Table, _ref=seed_ref) -> pa.Table:
        sa = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        is_seed = pc.is_in(b.column("u"), value_set=sa)
        d = pc.if_else(is_seed, pa.scalar(0, pa.int64()), pa.scalar(int(BFS_INF), pa.int64()))
        t = pa.table({"node": b.column("u"), "depth": d})
        return t.group_by(["node"]).aggregate([("depth", "min")]).rename_columns(["node", "depth"])

    depths = (
        und.map_batches(init_depth, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("depth", alias_name="depth"))
        .materialize()
    )
    n_nodes = depths.count()
    if n_nodes == 0:
        return depths
    if n_nodes <= small_graph_nodes:
        return _bfs_small(und, _collect(depths), max_iters)

    from ..config import shuffle_width

    nparts = shuffle_width()
    # Ray 2.49 hash aggregates emit zero-COLUMN blocks for empty hash
    # partitions and a later join's right side rejects them ("no match
    # for key field") — one repartition concatenates blocks and restores
    # the schema (same load-bearing fix as pagerank's rank table above).
    depths = depths.repartition(nparts).materialize()
    und = und.repartition(nparts).materialize()
    prev = _exact_depth_sum(depths)
    converged = False
    for _ in range(max_iters):
        msgs = und.join(
            depths, join_type="inner", num_partitions=nparts, on=("u",), right_on=("node",)
        )

        def to_msgs(b: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "node": b.column("v"),
                    "depth": pc.add(b.column("depth"), pa.scalar(1, pa.int64())),
                }
            )
            return t.group_by(["node"]).aggregate([("depth", "min")]).rename_columns(["node", "depth"])

        both = depths.union(msgs.map_batches(to_msgs, batch_format="pyarrow"))
        depths = (
            both.groupby("node")
            .aggregate(Min("depth", alias_name="depth"))
            .repartition(nparts)
            .materialize()
        )
        cur = _exact_depth_sum(depths)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        _warn_not_converged("bfs_depth", max_iters)

    def finish(b: pa.Table) -> pa.Table:
        d = b.column("depth")
        return pa.table(
            {
                "node": b.column("node"),
                "depth": pc.if_else(
                    pc.greater_equal(d, pa.scalar(int(BFS_INF), pa.int64())),
                    pa.scalar(-1, pa.int64()),
                    d,
                ),
            }
        )

    return depths.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------- weighted shortest path

def _sssp_small(
    und: ray.data.Dataset, dist_tbl: pa.Table, max_iters: int
) -> ray.data.Dataset:
    """Small regime: distance vector broadcast per round, weighted edges
    distributed — per-batch sparse (dst, min incoming dist+w) partials
    folded with np.minimum.at; exact vector-equality convergence."""
    nodes_arr = dist_tbl.column("node").combine_chunks()
    dist = dist_tbl.column("dist").to_numpy(zero_copy_only=False).copy()
    E_idx = _indexed_edges(und, nodes_arr, carry=("w",))
    converged = False
    for _ in range(max_iters):
        ref = ray.put(dist)

        def min_partial(b: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)
            ui = b.column("ui").to_numpy(zero_copy_only=False)
            vi = b.column("vi").to_numpy(zero_copy_only=False)
            w = b.column("w").to_numpy(zero_copy_only=False)
            uv, inv = np.unique(vi, return_inverse=True)
            m = np.full(len(uv), BFS_INF, dtype=np.int64)
            np.minimum.at(m, inv, d[ui] + w)
            return pa.table({"ci": pa.array(uv, pa.int64()), "m": pa.array(m, pa.int64())})

        new = dist.copy()
        for part in ray.get(
            E_idx.map_batches(min_partial, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
        ):
            if part.num_columns == 0 or part.num_rows == 0:
                continue
            ci = part.column("ci").to_numpy(zero_copy_only=False)
            m = part.column("m").to_numpy(zero_copy_only=False)
            np.minimum.at(new, ci, m)
        # never store a distance above the unreached sentinel, so the
        # stored vector is bounded and the slice-sum convergence check
        # in the shuffle regime stays exact for the same update rule
        np.minimum(new, BFS_INF, out=new)
        if np.array_equal(new, dist):
            converged = True
            break
        dist = new
    if not converged:
        _warn_not_converged("shortest_path", max_iters)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": nodes_arr,
                "dist": pa.array(np.where(dist >= BFS_INF, -1, dist), pa.int64()),
            }
        )
    )


def shortest_path(
    edges: ray.data.Dataset,
    seeds: list[str],
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    directed: bool = False,
    max_iters: int = 25,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
) -> ray.data.Dataset:
    """(node, dist): weighted shortest-path distance from the NEAREST
    seed — distributed Bellman-Ford as min-plus propagation
    (dist(v) = min over in-neighbors of dist(u) + w(u,v); seeds at 0).
    Unreachable nodes return dist = -1. ``weight_col`` must be
    NONNEGATIVE integers (validated per batch; min-plus with negative
    weights has no fixpoint on cycles); ``None`` means unit weights,
    which makes this multi-source BFS. ``directed=False`` (default)
    symmetrizes like :func:`bfs_depth`.

    Needs ≤ longest-shortest-path-hop-count rounds; non-convergence
    warns loudly. Every reachable distance must stay below 2**40 (the
    unreached sentinel) — true for any real corpus graph.

    Same two regimes and the same convergence trick as
    :func:`bfs_depth`: stored distances only decrease and are capped at
    the sentinel, so the exact 16-bit-slice sum strictly decreases
    until the fixpoint."""
    _check_max_iters(max_iters)
    seed_arr = pa.array(sorted(set(seeds)), pa.string())

    def edge_rows(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks().cast(pa.string())
        d = b.column(dst_col).combine_chunks().cast(pa.string())
        if weight_col is None:
            w = pa.array(np.ones(len(s), dtype=np.int64), pa.int64())
        else:
            w = b.column(weight_col).combine_chunks().cast(pa.int64())
            lo = pc.min(w).as_py() if len(w) else 0
            if lo is not None and lo < 0:
                raise ValueError(
                    f"shortest_path: negative weight {lo} in {weight_col!r} "
                    "(min-plus propagation requires nonnegative weights)"
                )
        if directed:
            return pa.table({"u": s, "v": d, "w": w})
        return pa.table(
            {
                "u": pa.concat_arrays([s, d]),
                "v": pa.concat_arrays([d, s]),
                "w": pa.concat_arrays([w, w]),
            }
        )

    und = edges.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()
    seed_ref = ray.put(seed_arr)

    def init_dist(b: pa.Table, _ref=seed_ref) -> pa.Table:
        sa = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        # node universe = every endpoint (u covers all only if
        # undirected; include v so directed sinks get a row too)
        nodes = pa.concat_arrays(
            [b.column("u").combine_chunks(), b.column("v").combine_chunks()]
        )
        is_seed = pc.is_in(nodes, value_set=sa)
        d = pc.if_else(is_seed, pa.scalar(0, pa.int64()), pa.scalar(int(BFS_INF), pa.int64()))
        t = pa.table({"node": nodes, "dist": d})
        return t.group_by(["node"]).aggregate([("dist", "min")]).rename_columns(["node", "dist"])

    dists = (
        und.map_batches(init_dist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("dist", alias_name="dist"))
        .materialize()
    )
    n_nodes = dists.count()
    if n_nodes == 0:
        return dists
    if n_nodes <= small_graph_nodes:
        return _sssp_small(und, _collect(dists), max_iters)

    from ..config import shuffle_width

    nparts = shuffle_width()
    # zero-column empty-block guard before the per-round joins (see the
    # pagerank/bfs_depth repartition note)
    dists = dists.repartition(nparts).materialize()
    und = und.repartition(nparts).materialize()
    prev = _exact_depth_sum(dists, col="dist")
    converged = False
    for _ in range(max_iters):
        msgs = und.join(
            dists, join_type="inner", num_partitions=nparts, on=("u",), right_on=("node",)
        )

        def to_msgs(b: pa.Table) -> pa.Table:
            d = pc.min_element_wise(
                pc.add(b.column("dist"), b.column("w")), pa.scalar(int(BFS_INF), pa.int64())
            )
            t = pa.table({"node": b.column("v"), "dist": d})
            return t.group_by(["node"]).aggregate([("dist", "min")]).rename_columns(["node", "dist"])

        both = dists.union(msgs.map_batches(to_msgs, batch_format="pyarrow"))
        dists = (
            both.groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .repartition(nparts)
            .materialize()
        )
        cur = _exact_depth_sum(dists, col="dist")
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        _warn_not_converged("shortest_path", max_iters)

    def finish(b: pa.Table) -> pa.Table:
        d = b.column("dist")
        return pa.table(
            {
                "node": b.column("node"),
                "dist": pc.if_else(
                    pc.greater_equal(d, pa.scalar(int(BFS_INF), pa.int64())),
                    pa.scalar(-1, pa.int64()),
                    d,
                ),
            }
        )

    return dists.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------- iterative-loop checkpointing

def _ckpt_load(d: str):
    """(meta, state_path) of the last COMMITTED round, or None."""
    import json
    import os

    meta_p = os.path.join(d, "meta.json")
    if not os.path.exists(meta_p):
        return None
    with open(meta_p) as f:
        meta = json.load(f)
    path = os.path.join(d, f"state-{meta['round']}")
    return (meta, path) if os.path.isdir(path) else None


def _ckpt_write(d: str, round_i: int, state: ray.data.Dataset, extra: dict) -> None:
    """Commit one round's node-scale state: per-round state dir (tmp +
    rename), then the meta.json pointer (the commit point — a crash
    before it leaves the previous round authoritative), then GC of
    older rounds. Node-scale, not edge-scale: checkpointing costs one
    labels write per round, never a corpus write."""
    import json
    import os
    import shutil

    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"state-{round_i}")
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    state.write_parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    meta_tmp = os.path.join(d, "meta.json.tmp")
    with open(meta_tmp, "w") as f:
        json.dump({"round": round_i, **extra}, f)
    os.replace(meta_tmp, os.path.join(d, "meta.json"))
    for name in os.listdir(d):
        if (
            name.startswith("state-")
            and name != f"state-{round_i}"
            and not name.endswith(".tmp")
        ):
            shutil.rmtree(os.path.join(d, name), ignore_errors=True)


# ----------------------------------------- harmonic centrality (landmarks)

def harmonic_centrality(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    k_landmarks: int = 8,
    seed: int = 7,
    max_iters: int = 25,
    small_graph_nodes: int = SMALL_GRAPH_NODES,
    landmark_key: str = "blake2b",
    rounding: str = "half_even8",
) -> ray.data.Dataset:
    """(node, centrality): harmonic centrality C(v) = Σ_{u≠v} 1/d(u, v)
    estimated from ``k_landmarks`` deterministic pseudo-random landmark
    nodes (the standard landmark/pivot scheme): one
    :func:`bfs_depth` run PER landmark (k small), depths combined as
    Ĉ(v) = (n−1)/|L∖{v}| · Σ_{ℓ∈L, d>0} 1/d(ℓ, v). With L = all nodes
    the estimator is EXACT (the test pins this); at 100 TB k stays
    small and the cost is k iterative BFS loops — the standard
    accuracy/cost dial for centrality at scale, stated rather than
    hidden. Landmarks are the k smallest hash values over the node set
    (partition-invariant bottom-k); ``landmark_key`` picks the hash:

    - ``"blake2b"`` (default): splitmix-grade ``stable_u64`` of
      ``hc|seed|node`` — the engine-native rule.
    - ``"md5"``: the full md5 hexdigest of the bare node string,
      compared lexicographically — chosen because DuckDB 1.0 exposes
      ``md5()``, so an oracle SQL can re-derive the SAME landmark set
      (``ORDER BY md5(node), node LIMIT k``); used by the oracle-backed
      kg_harmonic registry query. Both hashes are uniform; the
      estimator's statistics don't change.

    ``rounding`` fixes the output decimals: ``"half_even8"`` (default,
    np.round to 8) or ``"half_away6"`` — round-half-away-from-zero to 6
    decimals, mirroring DuckDB's ROUND bit-for-bit so distributed
    last-ulp sum divergence can't flip an oracle hash (the ts_ewma
    precedent). Unreachable pairs contribute 0 (the harmonic
    convention — why this beats closeness on disconnected graphs)."""
    _check_max_iters(max_iters)
    # pure argument validation up front — before the eager node
    # materialize / count / bottom-k merge / k BFS loops pay real work
    if landmark_key not in ("blake2b", "md5"):
        raise ValueError(f"unknown landmark_key {landmark_key!r}")
    if rounding not in ("half_even8", "half_away6"):
        raise ValueError(f"unknown rounding {rounding!r}")
    from ray.data.aggregate import Count, Sum

    from ..functions.hashing import stable_u64

    def node_rows(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [
                (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c).cast(pa.string())
                for c in (b.column(src_col), b.column(dst_col))
            ]
        )
        t = pa.table({"node": both})
        return t.group_by(["node"]).aggregate([]).rename_columns(["node"])

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "centrality": pa.array([], pa.float64())})
        )

    k = min(k_landmarks, n_nodes)

    def bottomk_partial(b: pa.Table) -> pa.Table:
        names = b.column("node").to_pylist()
        if landmark_key == "md5":
            import hashlib

            hx = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in names]
            order = sorted(range(len(names)), key=lambda i: (hx[i], names[i]))[:k]
            return pa.table(
                {
                    "node": pa.array([names[i] for i in order], pa.string()),
                    "h": pa.array([hx[i] for i in order], pa.string()),
                }
            )
        h = np.array([int(stable_u64(f"hc|{seed}|{x}")) for x in names], dtype=np.uint64)
        order = np.argsort(h, kind="stable")[:k]
        # keep UNSIGNED through the merge: an int64 reinterpretation
        # sorts hashes >= 2^63 negative-first, so the merged bottom-k
        # would disagree with the per-block uint64 rule (and with it,
        # the landmark set would depend on the block layout)
        return pa.table(
            {
                "node": pa.array([names[i] for i in order], pa.string()),
                "h": pa.array(h[order], pa.uint64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            nodes.map_batches(bottomk_partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns > 0 and t.num_rows > 0
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    order = pc.sort_indices(allp, sort_keys=[("h", "ascending"), ("node", "ascending")])[:k]
    landmarks = allp.take(order).column("node").to_pylist()
    lm_arr = pa.array(sorted(landmarks), pa.string())

    # one BFS per landmark; inverse depths union into one (node, inv) table
    inv_parts = []
    for lm in landmarks:
        depths = bfs_depth(
            edges,
            [lm],
            src_col=src_col,
            dst_col=dst_col,
            max_iters=max_iters,
            small_graph_nodes=small_graph_nodes,
        )

        def to_inv(b: pa.Table) -> pa.Table:
            d = b.column("depth").to_numpy(zero_copy_only=False).astype(np.float64)
            inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
            return pa.table({"node": b.column("node"), "inv": pa.array(inv, pa.float64())})

        inv_parts.append(depths.map_batches(to_inv, batch_format="pyarrow", zero_copy_batch=True))
    combined = inv_parts[0]
    for p in inv_parts[1:]:
        combined = combined.union(p)
    sums = combined.groupby("node").aggregate(Sum("inv", alias_name="s"))

    def finish(b: pa.Table) -> pa.Table:
        s = pc.fill_null(b.column("s"), 0.0)
        is_lm = pc.is_in(b.column("node"), value_set=lm_arr)
        # exclude the landmark itself from its own denominator
        denom = pc.subtract(
            pa.scalar(float(k)), pc.cast(pc.cast(is_lm, pa.int8()), pa.float64())
        )
        scale = pc.if_else(
            pc.greater(denom, 0.0),
            pc.divide(pa.scalar(float(n_nodes - 1)), denom),
            pa.scalar(0.0),
        )
        c = pc.multiply(s, scale)
        return pa.table({"node": b.column("node"), "centrality": c})

    out = sums.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

    def rnd(b: pa.Table) -> pa.Table:
        c = b.column("centrality").to_numpy(zero_copy_only=False)
        if rounding == "half_away6":
            from ..functions.rounding import round_half_away

            c = round_half_away(c, 6)
        else:
            c = np.round(c, 8)
        return pa.table(
            {"node": b.column("node"), "centrality": pa.array(c, pa.float64())}
        )

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------- bipartite projection

def bipartite_project(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 256,
) -> ray.data.Dataset:
    """Project a bipartite edge list onto its RIGHT side: (item_a,
    item_b, weight) where weight counts the left nodes connected to
    both — the co-occurrence graph builder (users×items → item-item,
    docs×terms → term co-occurrence) that feeds similarity and
    community ops downstream.

    Scale shape: distinct (src, dst) pairs only (one grouped dedup),
    then src-sharded VECTORIZED pair emission (sort + run-detect +
    np.triu_indices per shard — one Python call per shard, the
    shared_passages pattern) with per-shard pre-counted pairs before
    the final grouped Sum. A left node of degree d emits d·(d−1)/2
    pairs — quadratic — so degrees above ``max_degree`` are DROPPED
    (not truncated) and counted in a loud log line: a user who touched
    every item co-occurs with everything and carries no pair-specific
    signal (the boilerplate rule from shared_passages/dedup). Pairs
    are ordered (item_a < item_b lexicographically)."""
    import logging

    from ray.data.aggregate import Sum

    from ..functions.hashing import polars_u64
    from .dedup import SHARDS

    def dedup_pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": b.column(src_col).combine_chunks().cast(pa.string()),
                "v": b.column(dst_col).combine_chunks().cast(pa.string()),
            }
        )
        return t.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    def add_shard(b: pa.Table) -> pa.Table:
        h = polars_u64(b.column("u").combine_chunks())
        return b.append_column(
            "shard", pa.array((h % np.uint64(SHARDS)).astype(np.int32), pa.int32())
        )

    from ray.data.aggregate import Count

    def drop_count(b: pa.Table) -> pa.Table:
        return pa.table({"u": b.column("u"), "v": b.column("v")})

    distinct = (
        edges.map_batches(dedup_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(drop_count, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    )

    def shard_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "item_a": pa.array([], pa.string()),
                "item_b": pa.array([], pa.string()),
                "w": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n < 2:
            return empty
        u = group.column("u").combine_chunks()
        v = group.column("v").combine_chunks()
        order = pc.sort_indices(
            pa.table({"u": u, "v": v}), sort_keys=[("u", "ascending"), ("v", "ascending")]
        )
        u = u.take(order)
        v = v.take(order)
        same = pc.equal(u.slice(1), u.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ~same])
        ends = np.r_[starts[1:], n]
        a_parts, b_parts = [], []
        n_dropped = 0
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2:
                continue
            if d > max_degree:
                n_dropped += 1
                continue
            iu, ju = np.triu_indices(d, k=1)
            a_parts.append(s + iu)
            b_parts.append(s + ju)
        if n_dropped:
            logging.getLogger(__name__).info(
                "bipartite_project: dropped %d left nodes with degree > %d "
                "(quadratic pair blowup; no pair-specific signal)",
                n_dropped,
                max_degree,
            )
        if not a_parts:
            return empty
        ia = pa.array(np.concatenate(a_parts))
        ib = pa.array(np.concatenate(b_parts))
        t = pa.table({"item_a": v.take(ia), "item_b": v.take(ib)})
        g = t.group_by(["item_a", "item_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["item_a", "item_b", "w"])

    return (
        distinct.groupby("shard")
        .map_groups(shard_pairs, batch_format="pyarrow")
        .groupby(["item_a", "item_b"])
        .aggregate(Sum("w", alias_name="weight"))
    )


def association_rules(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int = 256,
    min_support: int = 1,
) -> ray.data.Dataset:
    """Pairwise association rules from a bipartite (basket → item)
    edge list: for each ordered item pair, support (co-baskets),
    confidence = support / baskets(a), and lift = support·N /
    (baskets(a)·baskets(b)) — the classic market-basket statistics,
    built on :func:`bipartite_project` (same dedup/cap rules) plus one
    grouped per-item basket count and one broadcast of the item-count
    dict (items are the SMALL side of any basket dataset). Emits both
    directions of every pair (confidence is asymmetric); rows below
    ``min_support`` drop. Floats rounded to 8 decimals."""
    from ray.data.aggregate import Count

    pairs = bipartite_project(
        edges, src_col=src_col, dst_col=dst_col, max_degree=max_degree
    )

    def dedup(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "u": b.column(src_col).combine_chunks().cast(pa.string()),
                "v": b.column(dst_col).combine_chunks().cast(pa.string()),
            }
        )
        return t.group_by(["u", "v"]).aggregate([]).rename_columns(["u", "v"])

    # Per-batch dedup is only a combiner — the SAME (u, v) edge can
    # appear in several batches, so a GLOBAL dedup level must precede
    # the counts (caught by the round-4 DuckDB oracle: per-item basket
    # counts were inflated ~9× at sf0.001, confidence/lift wrong; the
    # single-block brute-force test had masked it). The repartition
    # guards the Ray 2.49 zero-column-empty-block aggregate output
    # before the follow-on groupbys.
    distinct = (
        edges.map_batches(dedup, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_dup"))
        .repartition(8)
    )
    item_counts = (
        distinct.groupby("v").aggregate(Count(alias_name="n"))
    )
    n_baskets_tbl = distinct.groupby("u").aggregate(Count(alias_name="_n"))
    n_baskets = n_baskets_tbl.count()
    counts = {
        r["v"]: r["n"] for r in item_counts.take_all()
    }  # item-side vocabulary: small by construction (see docstring)
    counts_ref = ray.put(counts)

    def score(b: pa.Table, _ref=counts_ref) -> pa.Table:
        c = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        a_col = b.column("item_a").to_pylist()
        b_col = b.column("item_b").to_pylist()
        w = b.column("weight").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = np.array([c[x] for x in a_col], np.float64)
        cb = np.array([c[x] for x in b_col], np.float64)
        keep = w >= min_support
        out_a = a_col + b_col
        out_b = b_col + a_col
        ww = np.r_[w, w]
        d1 = np.r_[ca, cb]
        d2 = np.r_[cb, ca]
        kk = np.r_[keep, keep]
        # half-away (DuckDB ROUND semantics): np.round is half-even and
        # p/q ratios with power-of-two denominators CAN land exactly on
        # an 8th-decimal half (1/512 = 0.001953125)
        from ..functions.rounding import round_half_away

        conf = round_half_away(ww / d1, 8)
        lift = round_half_away(ww * float(n_baskets) / (d1 * d2), 8)
        t = pa.table(
            {
                "antecedent": pa.array(out_a, pa.string()),
                "consequent": pa.array(out_b, pa.string()),
                "support": pa.array(ww.astype(np.int64), pa.int64()),
                "confidence": pa.array(conf, pa.float64()),
                "lift": pa.array(lift, pa.float64()),
            }
        )
        return t.filter(pa.array(kk))

    return pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
