"""B-operator library: the relational core, each op as a Ray Data query
with a DuckDB oracle (SURVEY.md §2B; driver contract __ray_entry__.py).

Every entry in ``QUERIES`` maps name → (callable(sf_dir) → Dataset/Table,
oracle SQL or None). Column names in the Ray result and the SQL aliases
match EXACTLY (the driver's compare sorts columns by name before
hashing). Conventions:

- reads always prune columns (``read_parquet(columns=[...])``);
- stateless transforms are pure-Arrow ``map_batches`` (zero-copy);
- large⋈large joins use ``Dataset.join`` (hash shuffle);
- small sides broadcast via ``ray.put`` once, ``ray.get`` per task from
  node-local shared memory — never a shuffle;
- grouped aggregates pre-combine per batch before the groupby where the
  reduction allows it;
- floats that would compare bit-wise against DuckDB are either computed
  by the same IEEE expression or excluded from the output (ranks
  instead of scores).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .registry import QUERIES, register  # noqa: F401  (shared registry)


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_small(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a dimension table destined for broadcast."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


def _join_partitions() -> int:
    """Shuffle width for Dataset.join, sized to a QUARTER of the live
    cluster: join aggregators are actors that hold a CPU each while the
    map side feeds them, so aggregators == CPUs starves the producers
    (measured on the 600k-row sf0.1 join at 32 CPUs: 3.06 s at width 8,
    3.45 s at 16, 3.73 s at 24, 29 s at 32). At multi-node scale width
    should also grow with data volume via partition_size_hint; CPU/4 is
    the single-node sweet spot for these table sizes."""
    from ..config import shuffle_width

    return shuffle_width()



def _key_shard(key: pa.Array | pa.ChunkedArray, shards: int) -> pa.Array:
    """key % shards as int32 — the co-shuffle column for high-cardinality
    per-key reducers (asof, sessionize): one map_groups Python call per
    SHARD, with vectorized equal-key run handling inside (the pattern
    stages/dedup.py documents at its SHARDS constant)."""
    k = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
    arr = k.to_numpy(zero_copy_only=False)
    return pa.array((arr % shards).astype(np.int32), pa.int32())


def _collect(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a SMALL Dataset result to one Arrow table, dropping
    the zero-column empty blocks map_groups can emit (a naive
    concat_tables on the consumer side would reject them)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    return pa.concat_tables(tables, promote_options="default")

def _pin_ts_col(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Re-pin a timestamp column to [us]: Ray's shuffle ops (groupby /
    sort keys) can downcast timestamp[us] to [s], and the driver compares
    Arrow schemas exactly against the parquet-sourced oracle."""

    def fn(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(col)
        return b.set_column(i, col, pc.cast(b.column(col), pa.timestamp("us")))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


from ..functions.fold import sum_columns_merge as _sum_merge  # noqa: E402
from ..functions.fold import tree_fold as _tree_fold  # noqa: E402
from ..functions.rounding import round_half_away as _round_half_away  # noqa: E402


def _distill_keys(parts: "ray.data.Dataset", col: str = "k") -> np.ndarray:
    """Bound the driver-side collection of a distributed key distill
    (per-block unique partials feeding a broadcast anti-join): a
    repartition(16) + per-partition re-unique level caps the rows the
    driver receives at 16 × |distinct| regardless of block count — the
    driver must hold the distilled set itself, it IS the broadcast
    payload. Returns the sorted distinct int64 key array."""

    def uniq(b: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(b.column(col).combine_chunks())})

    rows = (
        parts.repartition(16)
        .map_batches(uniq, batch_size=None, batch_format="pyarrow")
        .take_all()  # bounded: ≤ 16 × |distinct| rows (see docstring)
    )
    return np.unique(np.array([r[col] for r in rows], dtype=np.int64))


def _round_cols(ds: ray.data.Dataset, digits: dict[str, int]) -> ray.data.Dataset:
    """Round float aggregate outputs (both the Ray result and the SQL
    oracle round identically): distributed float sums are order-dependent
    in the last ulps, so unrounded sums can never hash-match an oracle.
    Replicates DuckDB's ROUND bit-for-bit: round(|x|·10^nd + 0.5) away
    from zero, then one correctly-rounded division by 10^nd (pc.round's
    own scaling differs in the last ulp, so it is NOT used).

    DIGIT CHOICE matters: money terms like price·(1−disc) are EXACT
    4-decimal values, so their true sum is exactly representable at 4
    decimals and rounding there is stable (the float is ~1e-10 from the
    exact value, the nearest boundary 5e-5 away). Rounding the same sum
    at 2 decimals is NOT safe — a sum ending in ….xx50 sits exactly on
    the boundary and the engines' different accumulation orders decide
    the digit (observed: one q07 nation pair off by 0.01). Hence all
    disc-price sums round at 4; integer-valued sums (quantities) and
    2-decimal-exact sums (price totals) may round at 2."""

    def fn(b: pa.Table) -> pa.Table:
        for col, nd in digits.items():
            i = b.schema.get_field_index(col)
            x = b.column(col).to_numpy(zero_copy_only=False)
            b = b.set_column(i, col, pa.array(_round_half_away(x, nd), pa.float64()))
        return b

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- B4/B8 projection

@register(
    "b04_project_compute",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS revenue,
              l_quantity * 2.0 AS double_qty
       FROM lineitem""",
)
def b04_project_compute(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "revenue": rev,
                "double_qty": pc.multiply(b.column("l_quantity"), pa.scalar(2.0)),
            }
        )

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- B5 filter

@register(
    "b05_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
       FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
)
def b05_filter(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(b.column("l_quantity"), 45), pc.equal(b.column("l_returnflag"), "R"))
        return b.filter(m)

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------ B6 string functions

@register(
    "b06_string_funcs",
    """SELECT c_custkey, lower(c_name) AS name_lower,
              substring(c_name, 1, 9) AS name_prefix,
              length(c_name) AS name_len,
              (c_mktsegment LIKE '%ING%') AS seg_ing
       FROM customer""",
)
def b06_string_funcs(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        name = b.column("c_name")
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "name_lower": pc.utf8_lower(name),
                "name_prefix": pc.utf8_slice_codeunits(name, 0, 9),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "seg_ing": pc.match_substring(b.column("c_mktsegment"), "ING"),
            }
        )

    return _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------------- B7 date functions

@register(
    "b07_date_funcs",
    """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS order_year,
              CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
              count(*) AS n_orders,
              ROUND(sum(o_totalprice), 2) AS sum_price
       FROM orders GROUP BY order_year, order_month""",
)
def b07_date_funcs(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        t = pa.table(
            {
                "order_year": pc.cast(pc.year(d), pa.int64()),
                "order_month": pc.cast(pc.month(d), pa.int64()),
                "o_totalprice": b.column("o_totalprice"),
            }
        )
        # per-batch combiner before the shuffle
        g = t.group_by(["order_year", "order_month"]).aggregate([([], "count_all"), ("o_totalprice", "sum")])
        return g.rename_columns(["order_year", "order_month", "n_orders", "sum_price"])

    pre = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
    out = pre.groupby(["order_year", "order_month"]).aggregate(
        Sum("n_orders", alias_name="n_orders"), Sum("sum_price", alias_name="sum_price")
    )
    return _round_cols(out, {"sum_price": 2})


# ------------------------------------------------------------- B9 JSON

@register(
    "b09_json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
       FROM events""",
)
def b09_json_extract(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        import polars as pl

        k = pl.from_arrow(b.column("props")).str.json_path_match("$.k").cast(pl.Int64)
        return pa.table({"event_id": b.column("event_id"), "k_val": k.to_arrow()})

    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ----------------------------------------------------------- B10 list ops

@register(
    "b10_list_funcs",
    """SELECT vec_id, len(embedding) AS emb_len,
              CAST(embedding[1] AS DOUBLE) AS first_dim
       FROM embeddings""",
)
def b10_list_funcs(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        first = emb.flatten().take(emb.offsets.slice(0, len(emb)))
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "emb_len": pc.cast(pc.list_value_length(emb), pa.int64()),
                "first_dim": pc.cast(first, pa.float64()),
            }
        )

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------- B11 hash join

@register(
    "b11_hash_join",
    """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus,
              l_extendedprice, o_totalprice
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
)
def b11_hash_join(sf_dir: str) -> ray.data.Dataset:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"])
    j = li.join(orders, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    return j.select_columns(
        ["l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus", "l_extendedprice", "o_totalprice"]
    )


# -------------------------------------------------- B12 broadcast join

class _BroadcastLookup:
    """Small-side hash lookup held once per actor (ray.put broadcast).

    Inner-joins each batch against the broadcast table: probe
    ``probe_key`` in the batch against ``small_key`` in the small table,
    appending ``value_cols``. The small side ships into the object store
    ONCE and is read zero-copy per node — never re-shipped per batch.
    """

    def __init__(self, small_ref, probe_key: str, value_cols: list[str], small_key: str | None = None):
        small: pa.Table = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.probe_key = probe_key
        self.value_cols = value_cols
        self.keys = small.column(small_key or probe_key).combine_chunks()
        self.values = {c: small.column(c).combine_chunks() for c in value_cols}

    def __call__(self, b: pa.Table) -> pa.Table:
        # One vectorized hash probe per batch (Arrow kernel) — no Python
        # row loop. index_in returns null for misses → filter both sides.
        idx = pc.index_in(b.column(self.probe_key), value_set=self.keys)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        keep = idx.is_valid()
        b = b.filter(keep)
        idx = idx.filter(keep)
        out = {c: b.column(c) for c in b.column_names}
        for c in self.value_cols:
            out[c] = self.values[c].take(idx)
        return pa.table(out)


@register(
    "b12_broadcast_join",
    """SELECT c_custkey, c_name, n_name, r_name
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey""",
)
def b12_broadcast_join(sf_dir: str) -> ray.data.Dataset:
    nation = _read_small(sf_dir, "nation")
    region = _read_small(sf_dir, "region")
    # Pre-join the two tiny dims driver-side, broadcast the result once.
    nr = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    nr_ref = ray.put(nr.select(["n_nationkey", "n_name", "r_name"]))
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    ds = ds.map_batches(
        _BroadcastLookup,
        fn_constructor_kwargs={
            "small_ref": nr_ref,
            "probe_key": "c_nationkey",
            "small_key": "n_nationkey",
            "value_cols": ["n_name", "r_name"],
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return ds.select_columns(["c_custkey", "c_name", "n_name", "r_name"])


# ------------------------------------------------- B13 semi / anti join

@register(
    "b13_anti_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def b13_anti_join(sf_dir: str) -> pa.Table:
    """Broadcast anti join (orders' custkeys ship once via ray.put, each
    batch probes with one vectorized is_in). The key set distills
    DISTRIBUTED (per-batch unique combiner; orders is a fact table, the
    driver only ever holds the customer-bounded distinct keys — the q22
    review rule). Collected to a schema-pinned Table: the result can
    legitimately be 0 rows, and an empty untyped block would lose the
    (int64, string) schema on the driver side."""

    def key_pre(b: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(b.column("o_custkey").combine_chunks())})

    keys = _distill_keys(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            key_pre, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    key_ref = ray.put(pa.array(keys, pa.int64()))

    def fn(b: pa.Table, ref=key_ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return b.filter(pc.invert(pc.is_in(b.column("c_custkey"), value_set=keys)))

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())])
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    if not tables:
        return schema.empty_table()
    return pa.concat_tables([t.cast(schema) for t in tables])


@register(
    "b13_semi_join",
    """SELECT s_suppkey, s_name FROM supplier
       WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""",
)
def b13_semi_join(sf_dir: str) -> ray.data.Dataset:
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    wanted = nation.filter(pc.equal(nation.column("n_regionkey"), 0))
    keys = pa.array(sorted(wanted.column("n_nationkey").to_pylist()), pa.int32())

    def fn(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("s_nationkey"), value_set=keys)
        return b.filter(m).select(["s_suppkey", "s_name"])

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


@register(
    "b13c_anti_join_large",
    """SELECT o_orderkey, o_totalprice FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                         WHERE l.l_orderkey = o.o_orderkey
                           AND l.l_returnflag = 'R')""",
)
def b13c_anti_join_large(sf_dir: str) -> ray.data.Dataset:
    """Large-large ANTI join (NOT EXISTS) with NO broadcast side: a
    native left_anti hash join, both tables co-partitioned by orderkey
    through one key shuffle. The probe side pre-distincts per batch
    (group_by combiner) so only one row per (batch, orderkey) enters
    the shuffle — the B13 co-partition variant for when neither side
    fits in memory. (The same shape is expressible as a tagged-union
    groupby, but that pays one Python map_groups call per key — ~15k at
    sf0.01, 1.5M at sf1 — where the join stays columnar.)"""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def li_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        return b.group_by(["l_orderkey"]).aggregate([]).rename_columns(["o_orderkey"])

    probe = li.map_batches(li_pre, batch_format="pyarrow", zero_copy_batch=True)
    return orders.join(
        probe, join_type="left_anti", num_partitions=_join_partitions(), on=("o_orderkey",)
    )


# ------------------------------------------------------ B14 as-of join

@register(
    "b14_asof_join",
    """SELECT e.event_id, e.user_id, o.o_orderdate AS matched_date
       FROM events e ASOF JOIN orders o
         ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",
)
def b14_asof_join(sf_dir: str) -> ray.data.Dataset:
    """As-of join, a composition Ray Data lacks natively: tag both sides,
    union, co-shuffle by key % SHARDS, ONE vectorized merge per shard.

    Grouping by the raw key costs one Python map_groups call per user
    (~|users| interpreter calls); grouping by the key shard instead makes
    the call count a constant (SHARDS) and the per-shard body fully
    vectorized: sort by (key, t, side), then a segmented running-maximum
    of order positions gives every event its latest order at-or-before
    its timestamp — no per-key loop at all. Partitioning assumption:
    one SHARD's rows fit one reducer; raise SHARDS with cluster size.
    """
    from ..stages.dedup import SHARDS, _key_runs

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def tag_events(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "key": key,
                "t": b.column("ts"),
                "event_id": b.column("event_id"),
                "is_event": pa.array([True] * b.num_rows, pa.bool_()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("o_custkey"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "key": key,
                "t": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                "event_id": pa.array([0] * b.num_rows, pa.int64()),
                "is_event": pa.array([False] * b.num_rows, pa.bool_()),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def merge_shard(group: pa.Table) -> pa.Table:
        t = group.column("t").combine_chunks().to_numpy(zero_copy_only=False)
        is_ev = group.column("is_event").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "matched_date": pa.array([], pa.timestamp("us")),
                }
            )
        # Sort by (key, t, orders-before-events): at equal timestamps the
        # order precedes the event, making the match INCLUSIVE — the
        # oracle's `ts >= o_orderdate`.
        order = np.lexsort((is_ev, t, key))
        t, is_ev, eid, key = t[order], is_ev[order], eid[order], key[order]
        starts, ends = _key_runs(key)
        run_start = np.repeat(starts, ends - starts)
        # Latest order position at-or-before each row; valid only if it
        # falls inside the row's own key run.
        cand = np.maximum.accumulate(np.where(~is_ev, np.arange(n), -1))
        hit = is_ev & (cand >= run_start)
        return pa.table(
            {
                "event_id": pa.array(eid[hit], pa.int64()),
                "user_id": pa.array(key[hit], pa.int64()),
                "matched_date": pa.array(
                    t[cand[hit]].astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return both.groupby("shard").map_groups(merge_shard, batch_format="pyarrow")


# ------------------------------------------------------ B33 range join

@register(
    "b33_range_join",
    """SELECT a.event_id AS event_a, b.event_id AS event_b
       FROM events a JOIN events b
         ON a.user_id = b.user_id
        AND b.ts > a.ts
        AND b.ts <= a.ts + INTERVAL 30 MINUTE""",
)
def b33_range_join(sf_dir: str) -> ray.data.Dataset:
    """Interval (band) self-join — ALL follow-up events by the same user
    within 30 minutes of each event, not just the nearest (that is the
    b14 as-of family). Ray Data has no non-equi join; the composition
    is the b14 shape: co-shuffle on key % SHARDS, one merge per shard.
    Inside a shard, rows sort by (key, t); each key run answers every
    probe with two vectorized searchsorteds (band endpoints), and the
    matched pairs expand by repeat + range arithmetic — the per-run
    loop is in-process (the minhash bucket pattern), never a Ray call
    per key. Output size = true match count, never a cross product."""
    from ..stages.dedup import SHARDS, _key_runs

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def tag(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "key": key,
                "t": b.column("ts"),
                "rid": b.column("event_id"),
            }
        )

    window = np.timedelta64(30, "m")

    def merge_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_a": pa.array([], pa.int64()), "event_b": pa.array([], pa.int64())}
        )
        n = group.num_rows
        if n < 2:
            return empty
        t = group.column("t").combine_chunks().to_numpy(zero_copy_only=False)
        rid = group.column("rid").combine_chunks().to_numpy(zero_copy_only=False)
        key = group.column("key").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((t, key))
        t, rid, key = t[order], rid[order], key[order]
        a_out, b_out = [], []
        for s, e in zip(*_key_runs(key)):
            if e - s < 2:
                continue
            run_t = t[s:e]
            run_id = rid[s:e]
            # followers with ts in (a.ts, a.ts + 30min]
            lo = np.searchsorted(run_t, run_t, side="right")
            hi = np.searchsorted(run_t, run_t + window, side="right")
            cnt = hi - lo
            keep = cnt > 0
            if not keep.any():
                continue
            lo, cnt = lo[keep], cnt[keep]
            total = int(cnt.sum())
            base = np.repeat(lo, cnt)
            excl = np.repeat(np.r_[0, np.cumsum(cnt)[:-1]], cnt)
            b_idx = base + (np.arange(total) - excl)
            a_out.append(np.repeat(run_id[keep], cnt))
            b_out.append(run_id[b_idx])
        if not a_out:
            return empty
        return pa.table(
            {
                "event_a": pa.array(np.concatenate(a_out), pa.int64()),
                "event_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    return (
        events.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(merge_shard, batch_format="pyarrow")
    )


# ----------------------------------------------------- B34 lag window

@register(
    "b34_lag_delta",
    """SELECT user_id, event_id,
              CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s
       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def b34_lag_delta(sf_dir: str) -> ray.data.Dataset:
    """LAG window function: seconds since the user's previous event
    (NULL for each user's first). The remaining window-function class
    beside rank (b27b) and frame aggregates (b26/b27): same shard
    shape, one vectorized diff per shard. gap_s matches DuckDB's
    date_diff('second') boundary-count semantics exactly via integer
    epoch-second floors — no float comparison risk."""
    from ..stages.dedup import SHARDS

    def tag(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
            }
        )

    def lag_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, ts = uid[order], eid[order], ts[order]
        sec = ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = sec[1:] - sec[:-1]
        first = np.r_[True, uid[1:] != uid[:-1]]
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "gap_s": pa.array(
                    np.where(first, 0, gap), pa.int64(), mask=first
                ),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(lag_shard, batch_format="pyarrow")
    )


# ----------------------------------------------------- B35 ntile window

@register(
    "b35_ntile",
    """SELECT user_id, event_id,
              CAST(ntile(4) OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS BIGINT) AS quartile
       FROM events""",
)
def b35_ntile(sf_dir: str) -> ray.data.Dataset:
    """NTILE window function: per-user value quartiles. Completes the
    window family (rank b27b, LAG b34, frame aggregates b26/b27) with
    the equal-height bucketing class. Same shard shape; the tile
    assignment is the SQL-standard split (first n%k tiles get one extra
    row), computed with pure integer arithmetic per run — no float
    comparison surface."""
    from ..stages.dedup import SHARDS, _key_runs

    K = 4

    def tag(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_id": b.column("event_id"),
                "value": b.column("value"),
            }
        )

    def ntile_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "quartile": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))
        uid, eid = uid[order], eid[order]
        starts, ends = _key_runs(uid)
        sizes = ends - starts
        pos = np.arange(n) - np.repeat(starts, sizes)
        run_n = np.repeat(sizes, sizes)
        q, r = run_n // K, run_n % K
        # rows before the boundary sit in the (q+1)-sized leading tiles
        boundary = r * (q + 1)
        tile = np.where(
            pos < boundary,
            pos // np.maximum(q + 1, 1),
            r + (pos - boundary) // np.maximum(q, 1),
        )
        # runs smaller than K: q==0 → each row its own tile == pos
        tile = np.where(run_n < K, pos, tile)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "quartile": pa.array(tile + 1, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "value"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(ntile_shard, batch_format="pyarrow")
    )


# --------------------------------------------------- B15 global aggregate

@register(
    "b15_global_agg",
    """SELECT count(*) AS n_rows, ROUND(sum(l_quantity), 2) AS sum_qty,
              min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
              ROUND(avg(l_extendedprice), 4) AS avg_price
       FROM lineitem""",
)
def b15_global_agg(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_shipdate", "l_extendedprice"])
    res = ds.aggregate(
        Count(alias_name="n_rows"),
        Sum("l_quantity", alias_name="sum_qty"),
        Min("l_shipdate", alias_name="min_ship"),
        Max("l_shipdate", alias_name="max_ship"),
        Mean("l_extendedprice", alias_name="avg_price"),
    )
    res["sum_qty"] = float(_round_half_away(np.array([res["sum_qty"]]), 2)[0])
    res["avg_price"] = float(_round_half_away(np.array([res["avg_price"]]), 4)[0])
    return pa.Table.from_pylist([res])


# ---------------------------------------------- B16 grouped agg (TPC-H Q1)

@register(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              ROUND(sum(l_quantity), 2) AS sum_qty,
              ROUND(sum(l_extendedprice), 2) AS sum_base_price,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q01_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), cutoff))
        disc = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "l_quantity": b.column("l_quantity"),
                "l_extendedprice": b.column("l_extendedprice"),
                "disc_price": disc,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
        )

    pre_ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    out = pre_ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )
    return _round_cols(out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 4})


# ------------------------------------------------------------ B17 distinct

@register(
    "b17_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def b17_distinct(sf_dir: str) -> ray.data.Dataset:
    def pre(b: pa.Table) -> pa.Table:
        return b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate([])

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]).map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )
    return _collect(
        ds.groupby(["o_orderstatus", "o_orderpriority"]).map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow"
        )
    )


# ------------------------------------------------- B18 approx distinct (KMV)

@register("b18_approx_distinct", None)  # approximate → rows-only; tolerance
def b18_approx_distinct(sf_dir: str) -> pa.Table:  # tested vs exact in tests/
    """KMV distinct-count sketch over l_partkey: per-batch k-minimum
    hashes (tiny partials) merged TREE-SHAPED (functions.fold) — the scale shape for
    approx_count_distinct (±4.6% at k=512)."""
    from ..functions.sketch import kmv_estimate, kmv_merge, kmv_partial

    def partial(b: pa.Table) -> pa.Table:
        sk = kmv_partial(b.column("l_partkey").combine_chunks() if isinstance(b.column("l_partkey"), pa.ChunkedArray) else b.column("l_partkey"))
        return pa.table({"sketch": pa.array([sk.view(np.int64).tolist()], pa.list_(pa.int64()))})

    def merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: union of k-minimum sets IS kmv_merge."""
        if b.num_rows == 0:
            return pa.table({"sketch": pa.array([], pa.list_(pa.int64()))})
        sk = kmv_merge(
            [np.asarray(x, dtype=np.int64).view(np.uint64) for x in b.column("sketch").to_pylist()]
        )
        return pa.table({"sketch": pa.array([sk.view(np.int64).tolist()], pa.list_(pa.int64()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
    )
    sketches = [np.asarray(p["sketch"], dtype=np.int64).view(np.uint64) for p in parts]
    est = kmv_estimate(kmv_merge(sketches))
    return pa.table({"approx_distinct_partkeys": pa.array([int(round(est))], pa.int64())})


@register("b18b_hll_distinct", None)  # approximate → rows-only; tolerance
def b18b_hll_distinct(sf_dir: str) -> pa.Table:  # tested vs exact in tests/
    """HyperLogLog distinct-count over l_partkey — the register-merge
    sketch family beside KMV's k-smallest-union (B18): per-batch uint8
    register vectors (4 KB) merge by elementwise max driver-side;
    ±1.6% at 2^12 registers."""
    from ..functions.sketch import hll_estimate, hll_merge, hll_partial

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("l_partkey")
        regs = hll_partial(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    def merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: elementwise register max IS hll_merge."""
        if b.num_rows == 0:
            return pa.table({"regs": pa.array([], pa.list_(pa.uint8()))})
        regs = hll_merge([np.asarray(x, dtype=np.uint8) for x in b.column("regs").to_pylist()])
        return pa.table({"regs": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
    )
    regs = hll_merge([np.asarray(p["regs"], dtype=np.uint8) for p in parts])
    est = hll_estimate(regs)
    return pa.table({"hll_distinct_partkeys": pa.array([int(round(est))], pa.int64())})


# --------------------------------------------------------- B19/B20 sort/topk

@register(
    "b19_sort",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC",
)
def b19_sort(sf_dir: str) -> ray.data.Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).sort("o_totalprice", descending=True)


@register(
    "b20_topk",
    """SELECT c_custkey, c_acctbal FROM customer
       ORDER BY c_acctbal DESC, c_custkey LIMIT 10""",
)
def b20_topk(sf_dir: str) -> ray.data.Dataset:
    return (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
        .sort(["c_acctbal", "c_custkey"], descending=[True, False])
        .limit(10)
    )


# ------------------------------------------------------------- B21 sample

@register(
    "b21_sample",
    # exact replica of the hash filter in HUGEINT: the composite key
    # (l_orderkey·8 + l_linenumber, linenumber < 8) times the odd
    # Fibonacci multiplier is a bijection mod 2^64, compared against
    # floor(0.1·2^64) — integer-exact on both engines.
    # the *8 happens AFTER the 128-bit cast (same rule as
    # data_global_shuffle): in BIGINT it would overflow for
    # l_orderkey >= 2^60 where the uint64 kernel wraps mod 2^64.
    # UHUGEINT (not HUGEINT): keymod*M reaches ~2.1e38 > HUGEINT max;
    # and EVERY operand is cast because DuckDB 1.0 promotes
    # UHUGEINT-mixed-with-signed arithmetic to DOUBLE (measured) —
    # verified exact vs the uint64 kernel up to l_orderkey = 2^63-1
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE ((CAST(l_orderkey AS UHUGEINT) * CAST(8 AS UHUGEINT)
               + CAST(l_linenumber AS UHUGEINT))
              % CAST(18446744073709551616 AS UHUGEINT)
              * CAST(11400714819323198485 AS UHUGEINT))
             % CAST(18446744073709551616 AS UHUGEINT)
             < CAST(1844674407370955161 AS UHUGEINT)""",
)
def b21_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic ~10% Bernoulli sample by multiplicative hash of
    the (l_orderkey, l_linenumber) composite key — partitioning- and
    cluster-size-invariant (Dataset.random_sample draws per block, so
    the same corpus at a different layout sampled DIFFERENT rows), and
    integer-exact against the DuckDB oracle (VERDICT r4 ask #5). The
    hash is a bijection on Z_2^64, so the keep rate over distinct keys
    is exactly the threshold fraction in expectation with no collision
    bias; re-runs and resumes keep identical rows."""

    def keep(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ln = b.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ok * np.uint64(8) + ln) * np.uint64(11400714819323198485)
        return b.filter(pa.array(h < np.uint64(1844674407370955161)))

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


# -------------------------------------------------------------- B22 union

@register(
    "b22_union",
    """SELECT c_custkey AS key, 'high' AS bucket FROM customer WHERE c_acctbal > 9000
       UNION ALL
       SELECT c_custkey AS key, 'low' AS bucket FROM customer WHERE c_acctbal < -500""",
)
def b22_union(sf_dir: str) -> ray.data.Dataset:
    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def hi(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("c_acctbal"), 9000))
        return pa.table({"key": b.column("c_custkey"), "bucket": pa.array(["high"] * b.num_rows, pa.string())})

    def lo(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("c_acctbal"), -500))
        return pa.table({"key": b.column("c_custkey"), "bucket": pa.array(["low"] * b.num_rows, pa.string())})

    return base.map_batches(hi, batch_format="pyarrow").union(base.map_batches(lo, batch_format="pyarrow"))


# --------------------------------------------------- B23 intersect / except

def _distinct_vals(sf_dir: str, table: str, col: str) -> set:
    """Distributed distinct of one column: per-batch combiner (group_by)
    caps shuffle volume, then a grouped count whose output is one row per
    distinct value — only the (tiny) distinct set reaches the driver.
    Scale-safe for low-cardinality keys regardless of table size."""

    def pre(b: pa.Table) -> pa.Table:
        return b.group_by([col]).aggregate([]).rename_columns([col])

    rows = (
        _read(sf_dir, table, [col])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    return {r[col] for r in rows}


@register(
    "b23_intersect",
    """SELECT n_nationkey AS nationkey FROM nation
       WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
         AND n_nationkey IN (SELECT s_nationkey FROM supplier)""",
)
def b23_intersect(sf_dir: str) -> pa.Table:
    cust = _distinct_vals(sf_dir, "customer", "c_nationkey")
    supp = _distinct_vals(sf_dir, "supplier", "s_nationkey")
    nat = _read_small(sf_dir, "nation", ["n_nationkey"]).column("n_nationkey").to_pylist()
    keep = sorted(k for k in nat if k in cust and k in supp)
    return pa.table({"nationkey": pa.array(keep, pa.int32())})


# ----------------------------------------------------- B24 exact dedup

@register(
    "b24_exact_dedup",
    """SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text""",
)
def b24_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact near-identity dedup: hash-partition by content, keep the
    first (lowest doc_id) representative per distinct text."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["text"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["text", "doc_id"])

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id", "text"])


# --------------------------------------------- B26 tumbling window aggregate

@register(
    "b26_window_agg",
    """SELECT user_id, date_trunc('hour', ts) AS window_start,
              count(*) AS n_events, ROUND(sum(value), 4) AS sum_value
       FROM events GROUP BY user_id, window_start""",
)
def b26_window_agg(sf_dir: str) -> ray.data.Dataset:
    def pre(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "window_start": pc.floor_temporal(b.column("ts"), unit="hour"),
                "value": b.column("value"),
            }
        )
        g = t.group_by(["user_id", "window_start"]).aggregate([([], "count_all"), ("value", "sum")])
        return g.rename_columns(["user_id", "window_start", "n_events", "sum_value"])

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.groupby(["user_id", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )
    return _round_cols(_pin_ts_col(out, "window_start"), {"sum_value": 4})


# ------------------------------------------------------- B27 sessionization

@register(
    "b27_sessionize",
    """WITH gaps AS (
         SELECT user_id, ts, event_id,
                CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       OR lag(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS is_new
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ),
       sess AS (
         SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) - 1 AS session_id
         FROM gaps
       )
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
              count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
       FROM sess GROUP BY user_id, session_id""",
)
def b27_sessionize(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization (30 min), sharded: co-shuffle on
    user_id % SHARDS, then ONE vectorized pass per shard — sort by
    (user, ts), session boundaries where the user changes or the gap
    exceeds 30 min, per-session stats via run offsets. No per-user
    Python call (the raw-key groupby paid ~|users| interpreter calls)."""
    from ..stages.dedup import SHARDS

    gap = np.timedelta64(30, "m")

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {"shard": _key_shard(key, SHARDS), "user_id": key, "ts": b.column("ts")}
        )

    def sessions_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                }
            )
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        starts = np.nonzero(new)[0]
        ends = np.r_[starts[1:], n]
        users = uid[starts]
        # session_id = index of the session within its user block.
        ufirst = np.nonzero(np.r_[True, users[1:] != users[:-1]])[0]
        sid = np.arange(len(starts)) - np.repeat(ufirst, np.diff(np.r_[ufirst, len(starts)]))
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "session_start": pa.array(ts[starts].astype("datetime64[us]"), pa.timestamp("us")),
                "session_end": pa.array(ts[ends - 1].astype("datetime64[us]"), pa.timestamp("us")),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(sessions_shard, batch_format="pyarrow")
    )


# ------------------------------------------------------------ B28 kNN

@register(
    "b28_knn",
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.qe, e.embedding) AS cos
         FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id
       )
       SELECT query_id, neighbor_id,
              CAST(row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       FROM scored QUALIFY rank <= 5""",
)
def b28_knn(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-k: broadcast the query matrix, one numpy
    matmul per batch, per-batch top-k partials, exact driver-side merge.
    Rank ties break on neighbor_id (pinned in both Ray and SQL)."""
    emb_tbl = _read_small(sf_dir, "embeddings", ["vec_id", "embedding"])
    qmask = pc.less(emb_tbl.column("vec_id"), 3)
    q = emb_tbl.filter(qmask)
    q_ids = q.column("vec_id").to_pylist()
    Q = np.array(q.column("embedding").to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, Qn))

    def score(b: pa.Table, ref=q_ref) -> pa.Table:
        ids, Qn = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, -1).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = Xn @ Qn.T  # [n, q]
        vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(ids):
            c = cos[:, qi]
            mask = vec_ids != qid
            cand = np.nonzero(mask)[0]
            top = cand[np.lexsort((vec_ids[cand], -c[cand]))][:5]
            out_q += [qid] * len(top)
            out_n += vec_ids[top].tolist()
            out_c += c[top].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    allp = pa.concat_tables([ray.get(r) for r in partials])
    rows = []
    d = allp.to_pydict()
    by_q: dict[int, list[tuple[float, int]]] = {}
    for qid, nid, cos in zip(d["query_id"], d["neighbor_id"], d["cos"]):
        by_q.setdefault(qid, []).append((cos, nid))
    for qid in sorted(by_q):
        cands = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:5]
        for rank, (_, nid) in enumerate(cands, start=1):
            rows.append({"query_id": qid, "neighbor_id": nid, "rank": rank})
    return pa.Table.from_pylist(rows)


# ------------------------------------------------------- B29 repartition

@register(
    "b29_repartition",
    "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag",
)
def b29_repartition(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "lineitem", ["l_returnflag"]).repartition(8)

    def pre(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag"]).aggregate([([], "count_all")]).rename_columns(["l_returnflag", "n"])

    return ds.map_batches(pre, batch_format="pyarrow").groupby("l_returnflag").aggregate(
        Sum("n", alias_name="n")
    )


# ----------------------------------------------- TPC-H Q3 (multi-join + agg)

@register(
    "q03_shipping_priority",
    """SELECT l_orderkey,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
              o_orderdate
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def q03_shipping_priority(sf_dir: str) -> ray.data.Dataset:
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building = (
        cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey")
        .combine_chunks()
    )
    bkeys_ref = ray.put(building)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(b: pa.Table, ref=bkeys_ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        mask = pc.is_in(b.column("o_custkey"), value_set=keys)
        return b.filter(mask).select(["o_orderkey", "o_orderdate"])

    orders_f = orders.map_batches(filt_orders, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    j = li.join(orders_f, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))

    def pre(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = pa.table(
            {"l_orderkey": b.column("l_orderkey"), "o_orderdate": b.column("o_orderdate"), "revenue": rev}
        )
        return (
            t.group_by(["l_orderkey", "o_orderdate"]).aggregate([("revenue", "sum")])
            .rename_columns(["l_orderkey", "o_orderdate", "revenue"])
        )

    agg = (
        j.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    agg = _round_cols(agg, {"revenue": 4})
    out = agg.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(10).select_columns(
        ["l_orderkey", "revenue", "o_orderdate"]
    )
    return _pin_ts_col(out, "o_orderdate")



def _nation_dims_ref(sf_dir: str):
    """Broadcast tuple for supplier→nation / customer→nation probes:
    parallel key/value arrays (ray.put once) for vectorized index_in —
    shared by q05 (same-nation revenue) and q07 (nation-pair volume)."""
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nat_names = np.empty(int(nk.max()) + 1, dtype=object)
    nat_names[nk] = np.asarray(nation.column("n_name").to_pylist(), dtype=object)
    return ray.put(
        (
            supp.column("s_suppkey").combine_chunks(),
            supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64),
            cust.column("c_custkey").combine_chunks(),
            cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64),
            nat_names,
        )
    )


def _nation_revenue_pre(dims_ref, pair_mode: bool):
    """Per-batch combiner over the lineitem⋈orders join: probe the
    broadcast dims with one index_in each, mask to same-nation rows
    (``pair_mode=False``, q05) or cross-nation rows (True, q07), and
    reduce to per-(nation | nation-pair) revenue partials via bincount —
    no Python row loop on the fact table."""

    def pre(b: pa.Table, ref=dims_ref) -> pa.Table:
        supp_keys, supp_nat, cust_keys, cust_nat, nat_names = (
            ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        )
        n_nat = len(nat_names)
        sk = pc.fill_null(pc.index_in(b.column("l_suppkey"), value_set=supp_keys), -1)
        ck = pc.fill_null(pc.index_in(b.column("o_custkey"), value_set=cust_keys), -1)
        sk = sk.to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck.to_numpy(zero_copy_only=False).astype(np.int64)
        valid = (sk >= 0) & (ck >= 0)
        sn = supp_nat[np.where(valid, sk, 0)]
        cn = cust_nat[np.where(valid, ck, 0)]
        m = valid & ((sn != cn) if pair_mode else (sn == cn))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price[m] * (1.0 - disc[m])
        key = (sn[m] * n_nat + cn[m]) if pair_mode else sn[m]
        size = n_nat * n_nat if pair_mode else n_nat
        sums = np.bincount(key, weights=rev, minlength=size)
        counts = np.bincount(key, minlength=size)
        hit = np.nonzero(counts > 0)[0]
        if pair_mode:
            return pa.table(
                {
                    "supp_nation": pa.array(nat_names[hit // n_nat].tolist(), pa.string()),
                    "cust_nation": pa.array(nat_names[hit % n_nat].tolist(), pa.string()),
                    "revenue": pa.array(sums[hit], pa.float64()),
                }
            )
        return pa.table(
            {
                "n_name": pa.array(nat_names[hit].tolist(), pa.string()),
                "revenue": pa.array(sums[hit], pa.float64()),
            }
        )

    return pre


# ------------------------------------------- TPC-H Q5-ish (6-way join + agg)

@register(
    "q05_local_supplier",
    """SELECT n_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation   ON s_nationkey = n_nationkey
       GROUP BY n_name""",
)
def q05_local_supplier(sf_dir: str) -> ray.data.Dataset:
    dims_ref = _nation_dims_ref(sf_dir)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = li.join(orders, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    out = (
        j.map_batches(_nation_revenue_pre(dims_ref, pair_mode=False), batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return _round_cols(out, {"revenue": 4})


# ---------------------------------------------- TPC-H Q6-like (filter + agg)

@register(
    "q06_revenue_forecast",
    """SELECT ROUND(sum(l_extendedprice * l_discount), 4) AS revenue,
              count(*) AS n_rows
       FROM lineitem
       WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def q06_revenue_forecast(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(b.column("l_discount"), 0.05),
                pc.less_equal(b.column("l_discount"), 0.07),
            ),
            pc.less(b.column("l_quantity"), 24),
        )
        b = b.filter(m)
        rev = pc.multiply(b.column("l_extendedprice"), b.column("l_discount"))
        return pa.table(
            {
                "revenue": pa.array([pc.sum(rev).as_py() or 0.0], pa.float64()),
                "n_rows": pa.array([b.num_rows], pa.int64()),
            }
        )

    parts = _tree_fold(
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True), _sum_merge
    )
    rev = float(_round_half_away(np.array([sum(p["revenue"] for p in parts)]), 4)[0])
    return pa.table(
        {"revenue": pa.array([rev], pa.float64()), "n_rows": pa.array([sum(p["n_rows"] for p in parts)], pa.int64())}
    )


# ------------------------------------- TPC-H Q10-like (returned-item report)

@register(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
       GROUP BY c_custkey, c_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q10_returned_items(sf_dir: str) -> ray.data.Dataset:
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def filt(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"), "revenue": rev})

    li_f = li.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = li_f.join(orders, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_name"])
    names_ref = ray.put(
        (cust.column("c_custkey").combine_chunks(), cust.column("c_name").combine_chunks())
    )

    def pre(b: pa.Table, ref=names_ref) -> pa.Table:
        keys, names = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t = pa.table({"c_custkey": b.column("o_custkey"), "revenue": b.column("revenue")})
        g = t.group_by(["c_custkey"]).aggregate([("revenue", "sum")]).rename_columns(["c_custkey", "revenue"])
        idx = pc.index_in(g.column("c_custkey"), value_set=keys)
        return g.append_column(
            "c_name", pc.fill_null(names.take(idx), "")
        )

    agg = (
        j.map_batches(pre, batch_format="pyarrow")
        .groupby(["c_custkey", "c_name"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    agg = _round_cols(agg, {"revenue": 4})
    return agg.sort(["revenue", "c_custkey"], descending=[True, False]).limit(20).select_columns(
        ["c_custkey", "c_name", "revenue"]
    )


# ------------------------------------------------------ B8 math functions

@register(
    "b08_math_funcs",
    """SELECT p_partkey,
              ROUND(p_retailprice, 1) AS price_r1,
              abs(p_size - 25) AS size_dev,
              p_size % 7 AS size_mod,
              CAST(floor(sqrt(CAST(p_size AS DOUBLE))) AS BIGINT) AS size_sqrt_floor
       FROM part""",
)
def b08_math_funcs(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        size = b.column("p_size")
        price = b.column("p_retailprice").to_numpy(zero_copy_only=False)
        size_np = size.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "price_r1": pa.array(_round_half_away(price, 1), pa.float64()),
                "size_dev": pc.cast(pc.abs(pc.subtract(size, 25)), pa.int32()),
                "size_mod": pc.cast(
                    pc.subtract(size, pc.multiply(pc.divide(size, 7), 7)), pa.int32()
                ),
                "size_sqrt_floor": pa.array(np.floor(np.sqrt(size_np)).astype(np.int64), pa.int64()),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------- B26b sliding-window aggregate

@register(
    "b26b_sliding_window",
    """WITH halves AS (
         SELECT user_id, value, date_trunc('hour', ts) AS h,
                CASE WHEN date_part('minute', ts) >= 30 THEN 1 ELSE 0 END AS half
         FROM events
       ),
       starts AS (
         SELECT user_id, value,
                h + half * INTERVAL 30 MINUTE AS w FROM halves
         UNION ALL
         SELECT user_id, value,
                h + half * INTERVAL 30 MINUTE - INTERVAL 30 MINUTE AS w FROM halves
       )
       SELECT user_id, w AS window_start,
              count(*) AS n_events, ROUND(sum(value), 4) AS sum_value
       FROM starts GROUP BY user_id, window_start""",
)
def b26b_sliding_window(sf_dir: str) -> ray.data.Dataset:
    """Sliding 1h window, 30min stride: each event lands in the two
    windows covering it, expressed as a 1→2 flat-map before the grouped
    aggregate — the batch shape of sliding windows (no watermark
    machinery needed for batch KG construction, SURVEY.md §2B note)."""

    def pre(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        half_start = pc.floor_temporal(ts, multiple=30, unit="minute")
        w1 = half_start
        w0 = pc.subtract(half_start, pa.scalar(np.timedelta64(30 * 60 * 1_000_000, "us")))
        t = pa.table(
            {
                "user_id": pa.concat_arrays([b.column("user_id").combine_chunks()] * 2)
                if isinstance(b.column("user_id"), pa.ChunkedArray)
                else pa.concat_arrays([b.column("user_id")] * 2),
                "window_start": pa.concat_arrays(
                    [w1.combine_chunks() if isinstance(w1, pa.ChunkedArray) else w1,
                     w0.combine_chunks() if isinstance(w0, pa.ChunkedArray) else w0]
                ),
                "value": pa.concat_arrays([b.column("value").combine_chunks()] * 2)
                if isinstance(b.column("value"), pa.ChunkedArray)
                else pa.concat_arrays([b.column("value")] * 2),
            }
        )
        g = t.group_by(["user_id", "window_start"]).aggregate([([], "count_all"), ("value", "sum")])
        return g.rename_columns(["user_id", "window_start", "n_events", "sum_value"])

    out = (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
    )
    return _round_cols(_pin_ts_col(out, "window_start"), {"sum_value": 4})


# ------------------------------------------------------- B6b regex extract

@register(
    "b06b_regex_extract",
    """SELECT event_id,
              regexp_extract(props, '"k":\\s*(\\d+)', 1) AS k_str,
              regexp_matches(props, '^\\{') AS is_obj
       FROM events""",
)
def b06b_regex_extract(sf_dir: str) -> ray.data.Dataset:
    def fn(b: pa.Table) -> pa.Table:
        props = b.column("props")
        k = pc.extract_regex(props, pattern=r'"k":\s*(?P<k>\d+)')
        k_str = pc.if_else(pc.is_valid(k), pc.struct_field(k, "k"), pa.scalar("", pa.string()))
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "k_str": k_str,
                "is_obj": pc.match_substring_regex(props, r"^\{"),
            }
        )

    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# --------------------------------------------- B15b exact quantiles

@register(
    "b15b_quantiles",
    """SELECT quantile_cont(l_quantity, 0.5) AS median_qty,
              quantile_cont(l_quantity, 0.9) AS p90_qty,
              CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE) AS p25_disc
       FROM lineitem""",
)
def b15b_quantiles(sf_dir: str) -> pa.Table:
    """Exact distributed quantiles via a value histogram: groupby(value)
    → counts (tiny when the domain is bounded), then order statistics
    from cumulative counts with duckdb's interpolation semantics
    (quantile_cont: linear between floor/ceil order stats at q·(n−1);
    quantile_disc: the order stat at ceil(q·n)−1)."""

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_quantity"]).aggregate([([], "count_all")])
        return g.rename_columns(["val", "cnt"])

    parts = (
        _read(sf_dir, "lineitem", ["l_quantity"])
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("val")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    vals = np.array([p["val"] for p in parts], dtype=np.float64)
    cnts = np.array([p["cnt"] for p in parts], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])

    def order_stat(i: int) -> float:  # 0-based
        return float(vals[np.searchsorted(cum, i + 1)])

    def q_cont(q: float) -> float:
        pos = q * (n - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        if lo == hi:
            return order_stat(lo)
        frac = pos - lo
        return order_stat(lo) * (1 - frac) + order_stat(hi) * frac

    def q_disc(q: float) -> float:
        return order_stat(max(int(np.ceil(q * n)) - 1, 0))

    return pa.table(
        {
            "median_qty": pa.array([q_cont(0.5)], pa.float64()),
            "p90_qty": pa.array([q_cont(0.9)], pa.float64()),
            "p25_disc": pa.array([q_disc(0.25)], pa.float64()),
        }
    )


# --------------------------------------------- B16b ordered string_agg

@register(
    "b16b_string_agg",
    """SELECT o_orderstatus,
              string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
              count(*) AS n
       FROM orders GROUP BY o_orderstatus""",
)
def b16b_string_agg(sf_dir: str) -> ray.data.Dataset:
    """Collect-type aggregate: per group, the ordered distinct values
    joined into one string. Pre-distinct per batch caps shuffle volume;
    the final merge sorts, so output is order-deterministic."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate([([], "count_all")])
        return g.rename_columns(["o_orderstatus", "o_orderpriority", "n"])

    pre_ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]).map_batches(
        pre, batch_format="pyarrow", zero_copy_batch=True
    )

    def finalize(group: pa.Table) -> pa.Table:
        status = group.column("o_orderstatus")[0].as_py()
        prios = sorted(set(group.column("o_orderpriority").to_pylist()))
        n = sum(group.column("n").to_pylist())
        return pa.table(
            {
                "o_orderstatus": pa.array([status], pa.string()),
                "priorities": pa.array([",".join(prios)], pa.string()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return _collect(pre_ds.groupby("o_orderstatus").map_groups(finalize, batch_format="pyarrow"))


# ------------------------------------ TPC-H Q14-like (promo revenue share)

@register(
    "q14_promo_revenue",
    """SELECT ROUND(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END), 2) AS promo_revenue,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
              count(*) AS n_rows
       FROM lineitem JOIN part ON l_partkey = p_partkey""",
)
def q14_promo_revenue(sf_dir: str) -> pa.Table:
    """Broadcast join (part is small) + conditional aggregate: the promo
    flag ships as a ray.put bitmap keyed by partkey; each batch reduces
    to two partial sums, merged driver-side."""
    part = _read_small(sf_dir, "part", ["p_partkey", "p_type"])
    pk = np.asarray(part.column("p_partkey").to_pylist(), dtype=np.int64)
    is_promo = np.array(
        [t.startswith("PROMO") for t in part.column("p_type").to_pylist()], dtype=bool
    )
    # Dense bitmaps indexed by partkey — O(1) vectorized probe per batch.
    maxk = int(pk.max())
    known = np.zeros(maxk + 2, dtype=bool)
    promo_bm = np.zeros(maxk + 2, dtype=bool)
    known[pk] = True
    promo_bm[pk[is_promo]] = True
    ref = ray.put((known, promo_bm))

    def partial(b: pa.Table, ref=ref) -> pa.Table:
        known, promo_bm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = b.column("l_partkey").to_numpy(zero_copy_only=False)
        rev = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        ).to_numpy(zero_copy_only=False)
        k_clip = np.clip(k, 0, len(known) - 1)
        valid = known[k_clip] & (k == k_clip)
        total = float(rev[valid].sum())
        promo_sum = float(rev[valid & promo_bm[k_clip]].sum())
        n = int(valid.sum())
        return pa.table(
            {
                "promo": pa.array([promo_sum], pa.float64()),
                "total": pa.array([total], pa.float64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    parts = _tree_fold(
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        _sum_merge,
    )
    promo_rev = float(_round_half_away(np.array([100.0 * sum(p["promo"] for p in parts)]), 2)[0])
    total_rev = float(_round_half_away(np.array([sum(p["total"] for p in parts)]), 4)[0])
    return pa.table(
        {
            "promo_revenue": pa.array([promo_rev], pa.float64()),
            "total_revenue": pa.array([total_rev], pa.float64()),
            "n_rows": pa.array([sum(p["n"] for p in parts)], pa.int64()),
        }
    )


# ------------------------------- TPC-H Q4-like (order priority checking)

@register(
    "q04_order_priority",
    """SELECT o_orderpriority, count(*) AS n_late_orders
       FROM orders
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
       GROUP BY o_orderpriority""",
)
def q04_order_priority(sf_dir: str) -> ray.data.Dataset:
    """Large-large semi-join as max-aggregate + join: per order the max
    lineitem shipdate (pre-reduced per batch → small groupby), joined to
    orders, EXISTS ⇔ max_ship > o_orderdate."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "max_ship"])

    li_max = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Max("max_ship", alias_name="max_ship"))
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = orders.join(
        li_max, join_type="inner", num_partitions=_join_partitions(), on=("o_orderkey",), right_on=("l_orderkey",)
    )

    def late(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("max_ship"), b.column("o_orderdate")))
        g = b.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "n_late_orders"])

    return (
        j.map_batches(late, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late_orders", alias_name="n_late_orders"))
    )


# ----------------------------------------- documents facet counts

@register(
    "b16c_docs_by_source",
    """SELECT source, lang, count(*) AS n_docs,
              ROUND(avg(n_chars), 2) AS avg_chars,
              max(n_chars) AS max_chars
       FROM documents GROUP BY source, lang""",
)
def b16c_docs_by_source(sf_dir: str) -> ray.data.Dataset:
    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate(
            [([], "count_all"), ("n_chars", "sum"), ("n_chars", "max")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars", "max_chars"])

    agg = (
        _read(sf_dir, "documents", ["source", "lang", "n_chars"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
            Max("max_chars", alias_name="max_chars"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        avg = b.column("sum_chars").to_numpy(zero_copy_only=False) / np.maximum(
            b.column("n_docs").to_numpy(zero_copy_only=False), 1
        )
        return pa.table(
            {
                "source": b.column("source"),
                "lang": b.column("lang"),
                "n_docs": b.column("n_docs"),
                "avg_chars": pa.array(_round_half_away(avg, 2), pa.float64()),
                "max_chars": b.column("max_chars"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------- B23b except

@register(
    "b23b_except",
    """SELECT n_nationkey AS nationkey FROM nation
       WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
         AND n_nationkey NOT IN (SELECT s_nationkey FROM supplier)""",
)
def b23b_except(sf_dir: str) -> pa.Table:
    """EXCEPT via Dataset-side distincts (customer/supplier can be huge;
    only the distinct nationkey sets — bounded by |nation| — reach the
    driver, where the tiny nation side resolves membership)."""
    cust = _distinct_vals(sf_dir, "customer", "c_nationkey")
    supp = _distinct_vals(sf_dir, "supplier", "s_nationkey")
    nat = _read_small(sf_dir, "nation", ["n_nationkey"]).column("n_nationkey").to_pylist()
    keep = sorted(k for k in nat if k in cust and k not in supp)
    return pa.table({"nationkey": pa.array(keep, pa.int32())})


# ------------------------------------------------- window rank per group

@register(
    "b27b_topk_per_user",
    """SELECT user_id, event_id, value,
              CAST(row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS BIGINT) AS rnk
       FROM events QUALIFY rnk <= 3""",
)
def b27b_topk_per_user(sf_dir: str) -> ray.data.Dataset:
    """Windowed rank: top-3 events by value per user, sharded: co-shuffle
    on user_id % SHARDS, one vectorized pass per shard — sort by
    (user, -value, event_id), keep each user run's first 3 (no per-user
    Python call; same treatment as b14/b27). Ties pinned by event_id in
    both engines. A per-batch top-3 combiner before the shuffle would
    cut wire volume further at scale; at these row counts the shuffle
    is not the bottleneck."""
    from ..stages.dedup import SHARDS, _key_runs

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_id": b.column("event_id"),
                "value": b.column("value"),
            }
        )

    def topk_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        vals = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eids = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eids, -vals, uid))
        uid, vals, eids = uid[order], vals[order], eids[order]
        starts, ends = _key_runs(uid)
        pos = np.arange(n) - np.repeat(starts, ends - starts)
        keep = pos < 3
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_id": pa.array(eids[keep], pa.int64()),
                "value": pa.array(vals[keep], pa.float64()),
                "rnk": pa.array(pos[keep] + 1, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(topk_shard, batch_format="pyarrow")
    )


# --------------------------------------------------- B10b explode / unnest

@register(
    "b10b_explode_tokens",
    """SELECT doc_id, u.tok AS token
       FROM documents, unnest(string_split(trim(text), ' ')) AS u(tok)
       WHERE doc_id < 20 AND u.tok != ''""",
)
def b10b_explode_tokens(sf_dir: str) -> ray.data.Dataset:
    """List explode (1→N flat-map): whitespace tokens of the first 20
    docs, one row per token — the Ray shape of SQL unnest."""

    def fn(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("doc_id"), 20))
        toks = pc.split_pattern(pc.utf8_trim_whitespace(b.column("text")), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        t = pa.table(
            {"doc_id": b.column("doc_id").take(parent), "token": toks.flatten()}
        )
        return t.filter(pc.invert(pc.equal(t.column("token"), "")))

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------- B4b null semantics

@register(
    "b04b_null_semantics",
    """SELECT count(*) AS n_rows,
              count(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
              count(*) - count(NULLIF(l_discount, 0.0)) AS n_zero_disc,
              ROUND(sum(COALESCE(NULLIF(l_discount, 0.0), 0.0)), 4) AS sum_disc
       FROM lineitem""",
)
def b04b_null_semantics(sf_dir: str) -> pa.Table:
    """NULLIF/COALESCE/count-ignores-null parity: nulls introduced by
    NULLIF(l_discount, 0), counted and coalesced back."""

    def partial(b: pa.Table) -> pa.Table:
        disc = b.column("l_discount")
        nulled = pc.if_else(pc.equal(disc, 0.0), pa.scalar(None, pa.float64()), disc)
        return pa.table(
            {
                "n_rows": pa.array([b.num_rows], pa.int64()),
                "n_nonzero": pa.array([len(nulled) - nulled.null_count], pa.int64()),
                "sum_disc": pa.array([pc.sum(pc.coalesce(nulled, pa.scalar(0.0))).as_py() or 0.0], pa.float64()),
            }
        )

    parts = _tree_fold(
        _read(sf_dir, "lineitem", ["l_discount"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        _sum_merge,
    )
    n_rows = sum(p["n_rows"] for p in parts)
    n_nonzero = sum(p["n_nonzero"] for p in parts)
    sum_disc = float(_round_half_away(np.array([sum(p["sum_disc"] for p in parts)]), 4)[0])
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_nonzero_disc": pa.array([n_nonzero], pa.int64()),
            "n_zero_disc": pa.array([n_rows - n_nonzero], pa.int64()),
            "sum_disc": pa.array([sum_disc], pa.float64()),
        }
    )


# ------------------------------ Q2-like: argmax per group (top supplier)

@register(
    "q02_top_supplier_per_nation",
    """SELECT s_nationkey AS nationkey, s_suppkey, s_name, s_acctbal AS acctbal
       FROM supplier s
       WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                          WHERE s2.s_nationkey = s.s_nationkey)""",
)
def q02_top_supplier_per_nation(sf_dir: str) -> ray.data.Dataset:
    """Correlated-subquery argmax per group, the TPC-H Q2 shape: a
    combiner-first grouped MAX (tiny: one row per nation) broadcasts
    back and an equality filter keeps the argmax row(s). Two streamed
    passes over supplier, no driver-side bulk data."""

    def premax(b: pa.Table) -> pa.Table:
        g = b.group_by(["s_nationkey"]).aggregate([("s_acctbal", "max")])
        return g.rename_columns(["s_nationkey", "max_bal"])

    maxes = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(premax, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_nationkey")
        .aggregate(Max("max_bal", alias_name="max_bal"))
        .take_all()
    )
    nk = np.array([r["s_nationkey"] for r in maxes], dtype=np.int64)
    mx = np.array([r["max_bal"] for r in maxes], dtype=np.float64)
    dense = np.full(int(nk.max()) + 1, -np.inf)
    dense[nk] = mx
    ref = ray.put(dense)

    def pick(b: pa.Table, ref=ref) -> pa.Table:
        dense = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        nats = b.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        bal = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        keep = bal == dense[nats]
        b = b.filter(pa.array(keep))
        return pa.table(
            {
                "nationkey": pc.cast(b.column("s_nationkey"), pa.int32()),
                "s_suppkey": b.column("s_suppkey"),
                "s_name": b.column("s_name"),
                "acctbal": b.column("s_acctbal"),
            }
        )

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------- Q7-like: nation-pair trade volume (6-way join)

@register(
    "q07_nation_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
       FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                     JOIN supplier ON l_suppkey = s_suppkey
                     JOIN customer ON o_custkey = c_custkey
                     JOIN nation n1 ON s_nationkey = n1.n_nationkey
                     JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE n1.n_nationkey <> n2.n_nationkey
       GROUP BY supp_nation, cust_nation""",
)
def q07_nation_volume(sf_dir: str) -> ray.data.Dataset:
    """Cross-nation trade volume: ONE large-large hash join
    (lineitem⋈orders); the dims broadcast as parallel key arrays probed
    with vectorized index_in, partial sums per (supp_nation, cust_nation)
    pair via one bincount per batch (shared combiner with q05)."""
    dims_ref = _nation_dims_ref(sf_dir)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = li.join(orders, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    out = (
        j.map_batches(_nation_revenue_pre(dims_ref, pair_mode=True), batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    return _round_cols(out, {"revenue": 4})


# ---------------------- Q18-like: HAVING + join back (big-order report)

@register(
    "q18_big_orders",
    """SELECT o_orderkey, o_totalprice, ROUND(q.sum_qty, 2) AS sum_qty
       FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING sum(l_quantity) > 120) q
       JOIN orders ON o_orderkey = q.l_orderkey""",
)
def q18_big_orders(sf_dir: str) -> ray.data.Dataset:
    """Grouped HAVING then join back to the fact's parent: combiner-first
    sum per orderkey, post-aggregate filter (the HAVING), then one hash
    join to orders. l_quantity is integer-valued so the distributed sum
    is exact and the >120 cut matches the oracle bit-for-bit."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("l_quantity", "sum")])
        return g.rename_columns(["l_orderkey", "sum_qty"])

    qty = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
    )

    def having(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("sum_qty"), 120.0))

    big = qty.map_batches(having, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    j = big.join(orders, join_type="inner", num_partitions=_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))

    def finish(b: pa.Table) -> pa.Table:
        sq = b.column("sum_qty").to_numpy(zero_copy_only=False)
        # Dataset.join keeps only the LEFT key column for the equi-key.
        key = "o_orderkey" if "o_orderkey" in b.column_names else "l_orderkey"
        return pa.table(
            {
                "o_orderkey": b.column(key),
                "o_totalprice": b.column("o_totalprice"),
                "sum_qty": pa.array(_round_half_away(sq, 2), pa.float64()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ---------------- Q19-like: bracketed OR-of-ANDs filter over a dim join

@register(
    "q19_bracket_revenue",
    """SELECT ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
              count(*) AS n_rows
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#1' AND p_size <= 20 AND l_quantity >= 10)
          OR (p_brand = 'Brand#2' AND p_size <= 30 AND l_quantity >= 5)""",
)
def q19_bracket_revenue(sf_dir: str) -> pa.Table:
    """Disjunctive bracket predicate across fact and dim columns: part's
    (brand, size) broadcast as dense arrays indexed by partkey, each
    batch evaluates the whole OR-of-ANDs vectorized and reduces to one
    partial (sum, count) row."""
    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    maxk = int(pk.max())
    brand1 = np.zeros(maxk + 2, dtype=bool)
    brand2 = np.zeros(maxk + 2, dtype=bool)
    size = np.full(maxk + 2, 1 << 30, dtype=np.int64)
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    brand1[pk[brands == "Brand#1"]] = True
    brand2[pk[brands == "Brand#2"]] = True
    size[pk] = part.column("p_size").to_numpy(zero_copy_only=False)
    ref = ray.put((brand1, brand2, size))

    def partial(b: pa.Table, ref=ref) -> pa.Table:
        brand1, brand2, size = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = np.clip(b.column("l_partkey").to_numpy(zero_copy_only=False), 0, len(size) - 1)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        m = (brand1[k] & (size[k] <= 20) & (qty >= 10)) | (brand2[k] & (size[k] <= 30) & (qty >= 5))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = float((price[m] * (1.0 - disc[m])).sum())
        return pa.table(
            {"revenue": pa.array([rev], pa.float64()), "n_rows": pa.array([int(m.sum())], pa.int64())}
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    parts = _tree_fold(parts, _sum_merge)
    rev = float(_round_half_away(np.array([sum(p["revenue"] for p in parts)]), 4)[0])
    return pa.table(
        {
            "revenue": pa.array([rev], pa.float64()),
            "n_rows": pa.array([sum(p["n_rows"] for p in parts)], pa.int64()),
        }
    )


# ----------------------------- B16d: ROLLUP / grouping-sets aggregate

@register(
    "b16d_rollup",
    """SELECT source, lang, count(*) AS n_docs
       FROM documents GROUP BY ROLLUP (source, lang)""",
)
def b16d_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP as one distributed leaf aggregate + driver-side re-rollup:
    the (source, lang) leaf counts are tiny after the shuffle (≤ a few
    hundred rows), so the (source) and () levels derive from them
    without touching the table again — the standard grouping-sets plan."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "lang", "n_docs"])

    leaf = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )
    src = [r["source"] for r in leaf]
    lang = [r["lang"] for r in leaf]
    n = [r["n_docs"] for r in leaf]
    by_src: dict[str, int] = {}
    for s, c in zip(src, n):
        by_src[s] = by_src.get(s, 0) + c
    rows_src = sorted(by_src)
    return pa.table(
        {
            "source": pa.array(src + rows_src + [None], pa.string()),
            "lang": pa.array(lang + [None] * len(rows_src) + [None], pa.string()),
            "n_docs": pa.array(n + [by_src[s] for s in rows_src] + [sum(n)], pa.int64()),
        }
    )


# --------------------------------- B31: pivot (conditional aggregate)

@register(
    "b31_pivot_event_types",
    """SELECT user_id,
              count(*) FILTER (WHERE event_type = 'click')    AS n_click,
              count(*) FILTER (WHERE event_type = 'view')     AS n_view,
              count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
              count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
              count(*) FILTER (WHERE event_type = 'error')    AS n_error
       FROM events GROUP BY user_id""",
)
def b31_pivot_event_types(sf_dir: str) -> ray.data.Dataset:
    """Pivot a low-cardinality label column to counters: per-batch
    (user, type) counts spread into per-type columns (combiner), then
    one grouped SUM per user — no per-row Python, no wide shuffle of the
    label column."""
    types = ["click", "view", "purchase", "signup", "error"]

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        et = g.column("event_type")
        cols = {"user_id": g.column("user_id")}
        for t in types:
            cols[f"n_{t}"] = pc.if_else(
                pc.equal(et, t), g.column("count_all"), pa.scalar(0, pa.int64())
            )
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in types]
    return (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*aggs)
    )


# --------------------- B32: grouped vector aggregate (label centroids)

@register(
    "b32_group_centroids",
    """SELECT label, idx, ROUND(sum(val), 4) AS s, count(*) AS n
       FROM (SELECT label, unnest(embedding) AS val,
                    generate_subscripts(embedding, 1) AS idx
             FROM embeddings)
       GROUP BY label, idx""",
)
def b32_group_centroids(sf_dir: str) -> ray.data.Dataset:
    """Grouped VECTOR aggregate — per-label embedding centroids (the
    class-centroid op of training-data curation), long-form
    (label, dim-idx, sum, count). Each batch reduces to one partial sum
    vector per label (numpy matmul-free bincount over rows), so the
    shuffle carries |labels|·dim rows per batch, never the vectors."""

    def partial(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dim = 64
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim).astype(np.float64)
        labels = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(labels)
        o_label, o_idx, o_s, o_n = [], [], [], []
        for lab in uniq:
            m = labels == lab
            sums = X[m].sum(axis=0)
            o_label += [int(lab)] * dim
            o_idx += list(range(1, dim + 1))
            o_s += sums.tolist()
            o_n += [int(m.sum())] * dim
        return pa.table(
            {
                "label": pa.array(o_label, pa.int32()),
                "idx": pa.array(o_idx, pa.int64()),
                "s": pa.array(o_s, pa.float64()),
                "n": pa.array(o_n, pa.int64()),
            }
        )

    out = (
        _read(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "idx"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def pin_label(b: pa.Table) -> pa.Table:
        # Ray's grouped aggregate upcasts the int32 key to int64; pin it
        # back to the parquet source type for exact schema equality.
        i = b.schema.get_field_index("label")
        return b.set_column(i, "label", pc.cast(b.column("label"), pa.int32()))

    return _round_cols(out.map_batches(pin_label, batch_format="pyarrow", zero_copy_batch=True), {"s": 4})


# ------------------- B21b: deterministic stratified sample (k per group)

@register(
    "b21b_stratified_sample",
    """SELECT label, vec_id FROM (
         SELECT label, vec_id,
                row_number() OVER (PARTITION BY label
                                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) t
       WHERE rn <= 10""",
)
def b21b_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic stratified sampling: k=10 rows per label, chosen by
    md5-hash order (reproducible across engines and runs — the seeded
    alternative to random_sample when an exact oracle is wanted).
    Combiner keeps the k smallest hashes per (batch, label), the final
    per-label merge sees ≤ k·n_batches rows."""
    import hashlib as _hashlib

    K = 10

    def pre(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_pylist()
        labels = b.column("label").to_numpy(zero_copy_only=False)
        h = np.asarray([_hashlib.md5(str(v).encode()).hexdigest() for v in ids], dtype=object)
        keep = np.zeros(len(ids), dtype=bool)
        for lab in np.unique(labels):
            m = np.nonzero(labels == lab)[0]
            order = m[np.lexsort((np.asarray(ids, dtype=np.int64)[m], h[m]))][:K]
            keep[order] = True
        t = pa.table(
            {
                "label": b.column("label").filter(pa.array(keep)),
                "vec_id": b.column("vec_id").filter(pa.array(keep)),
                "h": pa.array(h[keep].tolist(), pa.string()),
            }
        )
        return t

    def topk(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        h = np.asarray(group.column("h").to_pylist(), dtype=object)
        order = np.lexsort((ids, h))[:K]
        return pa.table(
            {
                "label": group.column("label").take(pa.array(order)),
                "vec_id": pa.array(ids[order], pa.int64()),
            }
        )

    return (
        _read(sf_dir, "embeddings", ["label", "vec_id"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(topk, batch_format="pyarrow")
    )


# ------------------- B15c: grouped exact quantiles (per-group median/p90)

@register(
    "b15c_grouped_quantiles",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.5) AS median_qty,
              quantile_cont(l_quantity, 0.9) AS p90_qty,
              count(*) AS n
       FROM lineitem GROUP BY l_returnflag""",
)
def b15c_grouped_quantiles(sf_dir: str) -> pa.Table:
    """Exact PER-GROUP quantiles via per-(group, value) histograms: the
    shuffle carries only |groups|x|distinct values| count rows; order
    statistics resolve from cumulative counts per group driver-side
    (groups are few — the values never leave the cluster unaggregated).
    Same interpolation as b15b (DuckDB quantile_cont)."""

    def hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_returnflag", "l_quantity"]).aggregate([([], "count_all")])
        return g.rename_columns(["l_returnflag", "val", "cnt"])

    parts = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "val"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    by_flag: dict[str, list[tuple[float, int]]] = {}
    for p in parts:
        by_flag.setdefault(p["l_returnflag"], []).append((float(p["val"]), int(p["cnt"])))
    rows = []
    for flag in sorted(by_flag):
        vc = sorted(by_flag[flag])
        vals = np.array([v for v, _ in vc])
        cum = np.cumsum([c for _, c in vc])
        n = int(cum[-1])

        def order_stat(i: int) -> float:
            return float(vals[np.searchsorted(cum, i + 1)])

        def q_cont(q: float) -> float:
            pos = q * (n - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            if lo == hi:
                return order_stat(lo)
            frac = pos - lo
            return order_stat(lo) * (1 - frac) + order_stat(hi) * frac

        rows.append(
            {"l_returnflag": flag, "median_qty": q_cont(0.5), "p90_qty": q_cont(0.9), "n": n}
        )
    return pa.Table.from_pylist(rows)


# ------------------- B36: running total (cumulative window function)

@register(
    "b36_running_sum",
    """SELECT user_id, event_id,
              CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS BIGINT) AS cum_cents
       FROM events""",
)
def b36_running_sum(sf_dir: str) -> ray.data.Dataset:
    """Cumulative running total per user — the UNBOUNDED PRECEDING
    window frame (vs b26 tumbling, b26b sliding, b34 LAG, b35 NTILE).
    Same co-shuffle shape as b34: shard on user_id % SHARDS, one
    map_groups call per shard, sort by (user_id, ts, event_id) inside,
    then a single np.cumsum with per-user resets via cumsum-of-run-base
    subtraction (no Python loop over keys). Values are summed as exact
    integer cents (DuckDB round() is half-away-from-zero; mirrored by
    _round_half_away) so the running total is order-independent-exact
    and hash-matches the oracle bit-for-bit."""
    from ..stages.dedup import SHARDS

    def tag(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        val = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        cents = _round_half_away(val * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def cum_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "cum_cents": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        cents = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        total = np.cumsum(cents)
        first = np.r_[True, uid[1:] != uid[:-1]]
        # cumulative BEFORE each user's first row, broadcast down the run
        # (repeat, not accumulate: cents may be negative, so `total` is
        # not monotone)
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, n])
        base = np.repeat(total[starts] - cents[starts], lens)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "cum_cents": pa.array(total - base, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(cum_shard, batch_format="pyarrow")
    )


# ------------------- B37: CDC snapshot diff (change data capture)

@register(
    "b37_cdc_diff",
    """WITH old AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
       ),
       new AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]'
                       ELSE text END AS text
           FROM documents WHERE doc_id % 5 <> 0
       )
       SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
              CASE WHEN o.doc_id IS NULL THEN 'added'
                   WHEN n.doc_id IS NULL THEN 'removed'
                   ELSE 'changed' END AS status
       FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
       WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text""",
)
def b37_cdc_diff(sf_dir: str) -> ray.data.Dataset:
    """Change-data-capture between two corpus snapshots: added / removed
    / changed doc ids. The two snapshots are derived deterministically
    from `documents` (old = doc_id % 7 != 0 with original text; new =
    doc_id % 5 != 0 with text amended when doc_id % 3 == 0) so the
    oracle can build the identical pair in SQL.

    Scale shape: the payload NEVER enters the shuffle — each side maps
    to (doc_id, side, fingerprint) where fingerprint is a 64-bit stable
    content hash, then one co-shuffle on doc_id % SHARDS classifies
    every key vectorized (one Python call per shard, not per doc).
    At 100 TB this moves 24 bytes/doc instead of the document bodies;
    a full-outer Dataset.join of the raw snapshots would move the
    corpus twice."""
    from ..functions.hashing import polars_u64
    from ..stages.dedup import SHARDS

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fingerprint(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        text = b.column("text")
        amended = pc.binary_join_element_wise(text, pa.scalar(" [rev2]"), "")
        h_old = polars_u64(text).astype(np.int64)
        h_new = np.where(
            did % 3 == 0, polars_u64(amended).astype(np.int64), h_old
        )
        in_old = did % 7 != 0
        in_new = did % 5 != 0
        ids = np.r_[did[in_old], did[in_new]]
        return pa.table(
            {
                "shard": pa.array((ids % SHARDS).astype(np.int32), pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "side": pa.array(
                    np.r_[
                        np.zeros(int(in_old.sum()), np.int8),
                        np.ones(int(in_new.sum()), np.int8),
                    ],
                    pa.int8(),
                ),
                "h": pa.array(np.r_[h_old[in_old], h_new[in_new]], pa.int64()),
            }
        )

    def classify(group: pa.Table) -> pa.Table:
        did = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        side = group.column("side").combine_chunks().to_numpy(zero_copy_only=False)
        h = group.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((side, did))
        did, side, h = did[order], side[order], h[order]
        n = len(did)
        first = np.r_[True, did[1:] != did[:-1]]
        starts = np.flatnonzero(first)
        lens = np.diff(np.r_[starts, n])
        # each doc appears at most once per side: len 1 → one-sided,
        # len 2 → both sides (sorted old-then-new)
        one = starts[lens == 1]
        both = starts[lens == 2]
        changed = both[h[both] != h[both + 1]]
        ids = np.r_[did[one], did[changed]]
        status = np.r_[
            np.where(side[one] == 1, "added", "removed"),
            np.full(len(changed), "changed", dtype=object),
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "status": pa.array(status.astype(object), pa.string()),
            }
        )

    return (
        docs.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(classify, batch_format="pyarrow")
    )


# ------------------- B15d: approx quantiles (mergeable CDF sketch)

@register("b15d_approx_quantiles", None)  # approximate → rows-only; tolerance
def b15d_approx_quantiles(sf_dir: str) -> pa.Table:  # tested vs exact in tests/
    """Approximate p50/p90/p99 of l_extendedprice via the mergeable
    compressed-CDF sketch (functions/sketch.py): each batch compresses
    to 256 weighted points (4 KB), merged + recompressed driver-side.
    THE scale path for quantiles — b15b/b15c's exact histograms need
    bounded distinct values, this bounds only rank error (≲1 % at two
    merge levels). At 100 TB the partials would tree-merge through one
    intermediate groupby level instead of a flat driver merge."""
    from ..functions.sketch import quantile_merge, quantile_partial, quantile_query

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("l_extendedprice")
        vals = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_numpy(
            zero_copy_only=False
        )
        sk = quantile_partial(vals)
        return pa.table(
            {"sketch": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.float64()))}
        )

    def merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: quantile_merge is the sketch's own mergeable
        op (its error analysis covers the two-level tree)."""
        if b.num_rows == 0:
            return pa.table({"sketch": pa.array([], pa.list_(pa.float64()))})
        sk = quantile_merge(
            [np.asarray(x, dtype=np.float64).reshape(-1, 2) for x in b.column("sketch").to_pylist()]
        )
        return pa.table({"sketch": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.float64()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
    )
    sketches = [np.asarray(p["sketch"], dtype=np.float64).reshape(-1, 2) for p in parts]
    merged = quantile_merge(sketches)
    return pa.table(
        {
            "p50_price": pa.array([quantile_query(merged, 0.50)], pa.float64()),
            "p90_price": pa.array([quantile_query(merged, 0.90)], pa.float64()),
            "p99_price": pa.array([quantile_query(merged, 0.99)], pa.float64()),
        }
    )


# ------------------- B13d: bloom-prefiltered co-partition semi join

@register(
    "b13d_bloom_semi_join",
    """SELECT l_orderkey, l_extendedprice FROM lineitem
       WHERE l_orderkey IN
             (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)""",
)
def b13d_bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Large-large SEMI join with a broadcast BLOOM prefilter: the
    selective build side (orders > 400k, ~2 % of orders) compresses to
    a 128 KB bit array shipped once via ray.put; probe batches drop
    non-members BEFORE the key shuffle (no false negatives, ~0.6 %
    false positives), then the exact co-partition semi join runs on
    the survivors only. Result is EXACTLY the plain semi join (the
    oracle) — the bloom stage changes shuffle volume, never answers.
    At 100 TB this is the difference between shuffling the full fact
    table and shuffling ~2 % of it; the filter stays node-local shared
    memory on every worker."""
    from ..functions.sketch import bloom_build, bloom_contains

    # The bloom is an OR of per-key bit patterns, so it builds
    # DISTRIBUTED: one 128 KB partial per block of the (fact-sized)
    # build side, OR-merged driver-side — the driver never holds the
    # build keys themselves (tree-merge the partials at cluster scale).
    def bloom_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("o_totalprice"), 400000.0))
        keys = b.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        bits = bloom_build(keys.astype(np.uint64))
        return pa.table({"bits": pa.array([bits.view(np.int64).tolist()], pa.list_(pa.int64()))})

    def bloom_or_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: bitwise OR IS the bloom's mergeable op."""
        m = np.zeros_like(bloom_build(np.array([], dtype=np.uint64)))
        for row in b.column("bits").to_pylist():
            m |= np.asarray(row, dtype=np.int64).view(np.uint64)
        return pa.table({"bits": pa.array([m.view(np.int64).tolist()], pa.list_(pa.int64()))})

    parts = _tree_fold(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            bloom_pre, batch_format="pyarrow", zero_copy_batch=True
        ),
        bloom_or_merge,
    )
    merged = np.zeros_like(bloom_build(np.array([], dtype=np.uint64)))
    for p in parts:
        merged |= np.asarray(p["bits"], dtype=np.int64).view(np.uint64)
    bits_ref = ray.put(merged)

    class BloomProbe:
        def __init__(self, ref):
            self.bits = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b.column("l_orderkey").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            hit = bloom_contains(self.bits, keys.astype(np.uint64))
            return b.filter(pa.array(hit))

    survivors = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        BloomProbe,
        fn_constructor_args=(bits_ref,),
        concurrency=(1, 4),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # Exact semi-join build side stays a DATASET (per-batch filter +
    # pre-distinct; never collected to the driver).
    def build_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("o_totalprice"), 400000.0))
        return b.group_by(["o_orderkey"]).aggregate([]).rename_columns(["l_orderkey"])

    build_ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        build_pre, batch_format="pyarrow", zero_copy_batch=True
    )
    return survivors.join(
        build_ds,
        join_type="left_semi",
        num_partitions=_join_partitions(),
        on=("l_orderkey",),
    )


# ------------------- B38: unpivot / melt (inverse of B31 pivot)

@register(
    "b38_unpivot",
    """SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
       FROM lineitem
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
       FROM lineitem
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem""",
)
def b38_unpivot(sf_dir: str) -> ray.data.Dataset:
    """Wide → long melt: three metric columns become (metric, val)
    rows. Pure per-batch Arrow concat (each batch melts locally — the
    op is map-only, output 3× rows but no shuffle), the inverse shape
    of b31's pivot."""
    metrics = [("quantity", "l_quantity"), ("extendedprice", "l_extendedprice"), ("discount", "l_discount")]

    def melt(b: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "l_orderkey": b.column("l_orderkey"),
                    "l_linenumber": b.column("l_linenumber"),
                    "metric": pa.array([name] * b.num_rows, pa.string()),
                    "val": pc.cast(b.column(col), pa.float64()),
                }
            )
            for name, col in metrics
        ]
        return pa.concat_tables(parts)

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


# ------------------- B11b/B11c: outer joins (left / full)

@register(
    "b11b_left_outer_join",
    """SELECT o_orderkey, o_totalprice, l_linenumber, l_extendedprice
       FROM orders o LEFT JOIN lineitem l
         ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45""",
)
def b11b_left_outer_join(sf_dir: str) -> ray.data.Dataset:
    """LEFT OUTER hash join with a pushed-down probe-side predicate
    (quantity > 45 keeps ~10% of lineitem, so most orders null-extend):
    exercises null-producing join semantics plus filter-before-shuffle.
    Same native Dataset.join shuffle as b11, width CPU/4."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_quantity"), 45.0))
        return b.select(["l_orderkey", "l_linenumber", "l_extendedprice"])

    probe = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    j = orders.join(
        probe,
        join_type="left_outer",
        num_partitions=_join_partitions(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return j.select_columns(["o_orderkey", "o_totalprice", "l_linenumber", "l_extendedprice"])


@register(
    "b11c_full_outer_join",
    """WITH hi AS (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_totalprice > 300000),
         r AS (SELECT l_orderkey, sum(l_quantity) AS ret_qty FROM lineitem
               WHERE l_returnflag = 'R' GROUP BY l_orderkey)
       SELECT COALESCE(hi.o_orderkey, r.l_orderkey) AS orderkey,
              o_totalprice, ret_qty
       FROM hi FULL OUTER JOIN r ON hi.o_orderkey = r.l_orderkey""",
)
def b11c_full_outer_join(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join of two derived sides (high-value orders vs
    returned-quantity rollup) — rows survive from BOTH unmatched sides.
    The returned-qty side pre-aggregates per batch before its groupby
    (combiner), then one native full_outer shuffle; the COALESCEd key
    is computed per batch after the join (map-only)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def hi_pre(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("o_totalprice"), 300000.0))

    hi = orders.map_batches(hi_pre, batch_format="pyarrow", zero_copy_batch=True)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])

    def r_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        g = b.group_by(["l_orderkey"]).aggregate([("l_quantity", "sum")])
        return g.rename_columns(["l_orderkey", "ret_qty"])

    r = (
        li.map_batches(r_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("ret_qty", alias_name="ret_qty"))
    )
    j = hi.join(
        r,
        join_type="full_outer",
        num_partitions=_join_partitions(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def finish(b: pa.Table) -> pa.Table:
        # Dataset.join(full_outer) already COALESCEs the key pair into
        # the left key column, so only a rename remains
        return pa.table(
            {
                "orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
                "o_totalprice": b.column("o_totalprice"),
                "ret_qty": b.column("ret_qty"),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------- B15e: grouped approx quantiles (sketch per group)

@register("b15e_grouped_approx_quantiles", None)  # approximate → rows-only
def b15e_grouped_approx_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Per-group approximate p50/p90 via the mergeable CDF sketch,
    composed with groupby: each batch emits one 4 KB sketch per
    (group, batch) — the combiner — and map_groups merges per group.
    Unlike b15c's exact histogram (shuffle size = distinct values),
    the shuffle here is sketches × blocks regardless of value
    cardinality — the grouped-quantile shape that survives continuous
    value domains at 100 TB. Accuracy vs exact grouped order
    statistics is asserted in tests."""
    from ..functions.sketch import quantile_merge, quantile_partial, quantile_query

    def partial(b: pa.Table) -> pa.Table:
        # sort by flag and sketch each equal-key run in numpy — the
        # flag loop runs once per DISTINCT flag in the batch (3 here),
        # values never become Python objects
        flag_col = b.column("l_returnflag").combine_chunks()
        uniq = flag_col.unique()
        if len(flag_col) == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "sketch": pa.array([], pa.list_(pa.float64())),
                }
            )
        codes = pc.index_in(flag_col, value_set=uniq).to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(codes, kind="stable")
        codes, price = codes[order], price[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        flags, sketches = [], []
        for s, e in zip(starts, ends):
            flags.append(uniq[codes[s]].as_py())
            sketches.append(quantile_partial(price[s:e]).reshape(-1).tolist())
        return pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "sketch": pa.array(sketches, pa.list_(pa.float64())),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        sketches = [
            np.asarray(s, dtype=np.float64).reshape(-1, 2)
            for s in group.column("sketch").to_pylist()
        ]
        merged = quantile_merge(sketches)
        return pa.table(
            {
                "l_returnflag": pa.array([group.column("l_returnflag")[0].as_py()], pa.string()),
                "p50_price": pa.array([quantile_query(merged, 0.5)], pa.float64()),
                "p90_price": pa.array([quantile_query(merged, 0.9)], pa.float64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(merge, batch_format="pyarrow")
    )


# ------------------- B39: cross join (small × small)

@register(
    "b39_cross_join",
    """SELECT r_name, n_name FROM region CROSS JOIN nation""",
)
def b39_cross_join(sf_dir: str) -> ray.data.Dataset:
    """Cartesian product with a BROADCAST side: the small side ships
    once via ray.put and each batch expands locally (repeat × tile) —
    never a shuffle. Only sane when one side is dimension-sized; the
    batch-local expansion keeps output blocks bounded by
    |batch| × |small|."""
    region = _read_small(sf_dir, "region", ["r_name"])
    r_ref = ray.put(region.column("r_name").combine_chunks())

    class Cross:
        def __init__(self, ref):
            self.r = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = len(self.r)
            n = b.num_rows
            idx_n = pa.array(np.repeat(np.arange(n), k))
            idx_r = pa.array(np.tile(np.arange(k), n))
            return pa.table(
                {
                    "r_name": self.r.take(idx_r),
                    "n_name": b.column("n_name").combine_chunks().take(idx_n),
                }
            )

    return _read(sf_dir, "nation", ["n_name"]).map_batches(
        Cross,
        fn_constructor_args=(r_ref,),
        concurrency=(1, 4),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ------------------- B40: global row_number (range-partitioned rank)

@register(
    "b40_global_row_number",
    """SELECT event_id,
              ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
       FROM events""",
)
def b40_global_row_number(sf_dir: str) -> ray.data.Dataset:
    """Globally-contiguous ROW_NUMBER over a total order — the classic
    two-pass range-partitioned rank, never a single-node sort:

    pass 1: per-bucket row counts (bucket = hour(ts), a grouped COUNT
            whose result is #hours rows — driver-small at any data
            scale) -> exclusive prefix offsets, broadcast;
    pass 2: shuffle by bucket, sort each bucket locally, assign
            offset[bucket] + local index.

    Correctness is independent of bucket balance (any boundaries work
    because buckets partition the sort order); balance only affects
    parallelism, so production would derive boundaries from a quantile
    sample of ts instead of fixed hour walls. Per-bucket memory is the
    dial: narrow the bucket width if an hour of events outgrows a
    worker."""

    def bucketize(b: pa.Table) -> pa.Table:
        hours = pc.cast(
            pc.floor_temporal(b.column("ts"), unit="hour"), pa.int64()
        )
        return b.append_column("bucket", hours)

    ev = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = {
        r["bucket"]: r["count()"]
        for r in ev.groupby("bucket").count().take_all()
    }
    offsets, acc = {}, 0
    for bkt in sorted(counts):
        offsets[bkt] = acc
        acc += counts[bkt]

    def assign(g: pa.Table) -> pa.Table:
        ts = g.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        base = offsets[g.column("bucket")[0].as_py()]
        rn = np.empty(len(eid), dtype=np.int64)
        rn[order] = base + 1 + np.arange(len(eid), dtype=np.int64)
        return pa.table({"event_id": g.column("event_id"), "rn": pa.array(rn)})

    return ev.groupby("bucket").map_groups(assign, batch_format="pyarrow")


# ------------------- B41: heavy hitters (Misra-Gries mergeable sketch)

@register("b41_heavy_hitters", None)  # approximate -> rows-only; bound in tests
def b41_heavy_hitters(sf_dir: str) -> pa.Table:
    """Frequent-item (heavy hitter) sketch over l_partkey: per-batch
    exact value_counts compressed to k=64 Misra-Gries counters (<=1 KB
    per block), counter-addition merge driver-side. Every item with
    true frequency > n/(k+1) is guaranteed reported, with count
    underestimated by at most n/(k+1) — the bound tests assert. The
    100-TB shape for top-k-frequent where an exact groupby would
    shuffle every distinct key."""
    from ..functions.sketch import MG_K, mg_compress, mg_merge

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column("l_partkey").combine_chunks())
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        it, ct = mg_compress(items, counts)
        return pa.table(
            {
                "items": pa.array([it.tolist()], pa.list_(pa.int64())),
                "counts": pa.array([ct.tolist()], pa.list_(pa.int64())),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: mg_merge is Misra-Gries' own mergeable op
        (the one-sided error bound composes across the tree)."""
        if b.num_rows == 0:
            return pa.table(
                {
                    "items": pa.array([], pa.list_(pa.int64())),
                    "counts": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        it, ct = mg_merge(
            [
                (np.asarray(i, dtype=np.int64), np.asarray(c, dtype=np.int64))
                for i, c in zip(b.column("items").to_pylist(), b.column("counts").to_pylist())
            ]
        )
        n = int(pc.sum(b.column("n")).as_py() or 0)
        return pa.table(
            {
                "items": pa.array([it.tolist()], pa.list_(pa.int64())),
                "counts": pa.array([ct.tolist()], pa.list_(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    from ..functions.fold import tree_fold

    parts = tree_fold(
        _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
    )
    items, est = mg_merge(
        [
            (np.asarray(p["items"], dtype=np.int64), np.asarray(p["counts"], dtype=np.int64))
            for p in parts
        ]
    )
    n = sum(p["n"] for p in parts)
    order = np.argsort(est)[::-1]
    return pa.table(
        {
            "l_partkey": pa.array(items[order], pa.int64()),
            "est_count": pa.array(est[order], pa.int64()),
            "max_underestimate": pa.array([n // (MG_K + 1) + 1] * len(items), pa.int64()),
        }
    )


# ------------------- B42: grouped string_agg (ordered concat)

@register(
    "b42_string_agg",
    """SELECT n_name,
              string_agg(s_name, ',' ORDER BY s_name) AS members
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name""",
)
def b42_string_agg(sf_dir: str) -> ray.data.Dataset:
    """Ordered STRING_AGG per group: nation names broadcast (dimension
    side never shuffles), suppliers shuffle once on the group key, one
    sort + join per group. Grouped concat is inherently bounded by the
    largest group's total string size — acceptable here because groups
    are dimension-cardinality; for data-scale groups use
    :func:`b67_string_agg_capped`, which enforces a per-group member
    cap as a pre-shuffle combiner."""
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nmap_ref = ray.put(
        (
            nation.column("n_nationkey").combine_chunks(),
            nation.column("n_name").combine_chunks(),
        )
    )

    class AddNation:
        def __init__(self, ref):
            keys, names = ray.get(ref)
            self.keys, self.names = keys, names

        def __call__(self, b: pa.Table) -> pa.Table:
            pos = pc.index_in(b.column("s_nationkey"), value_set=self.keys)
            return pa.table(
                {
                    "n_name": pc.take(self.names, pos),
                    "s_name": b.column("s_name"),
                }
            )

    def concat(g: pa.Table) -> pa.Table:
        names = np.sort(g.column("s_name").combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "n_name": pa.array([g.column("n_name")[0].as_py()], pa.string()),
                "members": pa.array([",".join(names)], pa.string()),
            }
        )

    return (
        _read(sf_dir, "supplier", ["s_nationkey", "s_name"])
        .map_batches(
            AddNation,
            fn_constructor_args=(nmap_ref,),
            concurrency=(1, 4),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_name")
        .map_groups(concat, batch_format="pyarrow")
    )


# ------------------- B42b: capped string_agg (the b42 escape hatch)

@register(
    "b67_string_agg_capped",
    """SELECT n_name,
              array_to_string(list_slice(list_sort(list(s_name)), 1, 5), ',') AS members_capped,
              CAST(count(*) AS BIGINT) AS total_members
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY n_name""",
)
def b67_string_agg_capped(sf_dir: str, cap: int = 5) -> ray.data.Dataset:
    """b42's documented escape hatch for data-scale groups: ordered
    grouped concat CAPPED at the first `cap` members (ascending), plus
    the exact total member count. Unlike b42 — whose reducer state is
    bounded by the largest group's total string mass — the cap is
    enforced as a per-batch COMBINER before the shuffle: each
    (block, group) ships at most `cap` names and one count, so reducer
    state is O(groups·cap) regardless of group size. The merge of
    per-block capped prefixes is exact: the global smallest-`cap` set
    is a subset of the union of per-block smallest-`cap` sets."""
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nmap_ref = ray.put(
        (
            nation.column("n_nationkey").combine_chunks(),
            nation.column("n_name").combine_chunks(),
        )
    )

    class CappedPartial:
        """nation-key lookup + per-batch (group → first-cap names, count)."""

        def __init__(self, ref, cap: int):
            self.keys, self.names = ray.get(ref)
            self.cap = cap

        def __call__(self, b: pa.Table) -> pa.Table:
            pos = pc.index_in(b.column("s_nationkey"), value_set=self.keys)
            nn = pc.take(self.names, pos).to_numpy(zero_copy_only=False)
            sn = b.column("s_name").to_numpy(zero_copy_only=False)
            order = np.lexsort((sn, nn))
            nn, sn = nn[order], sn[order]
            keys, starts, counts = np.unique(nn, return_index=True, return_counts=True)
            members = [
                sn[s : s + min(self.cap, c)].tolist() for s, c in zip(starts, counts)
            ]
            return pa.table(
                {
                    "n_name": pa.array(keys, pa.string()),
                    "members": pa.array(members, pa.list_(pa.string())),
                    "cnt": pa.array(counts.astype(np.int64), pa.int64()),
                }
            )

    def merge(g: pa.Table, cap: int = cap) -> pa.Table:
        import heapq

        first = heapq.nsmallest(
            cap, (m for ms in g.column("members").to_pylist() for m in ms)
        )
        return pa.table(
            {
                "n_name": pa.array([g.column("n_name")[0].as_py()], pa.string()),
                "members_capped": pa.array([",".join(first)], pa.string()),
                "total_members": pa.array(
                    [int(pc.sum(g.column("cnt")).as_py() or 0)], pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "supplier", ["s_nationkey", "s_name"])
        .map_batches(
            CappedPartial,
            fn_constructor_args=(nmap_ref, cap),
            concurrency=(1, 4),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("n_name")
        .map_groups(merge, batch_format="pyarrow")
    )


# ------------------- B11d: salted shuffle join (hot-key mitigation)

@register(
    "b11d_salted_skew_join",
    """SELECT o_orderkey, c_name
       FROM orders JOIN customer ON o_custkey = c_custkey""",
)
def b11d_salted_skew_join(sf_dir: str, salts: int = 8) -> ray.data.Dataset:
    """Skew-safe shuffle join: the probe side salts each row by a hash
    of its OWN row key (so one hot join key fans out across `salts`
    reducers instead of melting one), and the build side replicates
    each row once per salt. Join on (key, salt) then drop the salt —
    the answer is oracle-identical to the plain join; only the shuffle
    layout changes. Cost model: build-side volume × salts, so salt
    only when a key histogram (b41's MG sketch is the probe) shows
    reducer-breaking heat; both TPC-H-ish sides here are uniform, the
    query exists to keep the mechanism oracle-verified."""

    def salt_probe(b: pa.Table) -> pa.Table:
        okey = b.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        s = ((okey.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(salts)
        return b.append_column("salt", pa.array(s.astype(np.int64)))

    def replicate_build(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = pa.array(np.tile(np.arange(n), salts))
        rep = b.take(idx)
        return rep.append_column(
            "salt", pa.array(np.repeat(np.arange(salts, dtype=np.int64), n))
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        salt_probe, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        replicate_build, batch_format="pyarrow", zero_copy_batch=True
    )
    j = orders.join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(),
        on=("o_custkey", "salt"),
        right_on=("c_custkey", "salt"),
    )
    return j.select_columns(["o_orderkey", "c_name"])


# ------------------- B21c: deterministic per-group sample (bottom-k by hash)

@register(
    "b21c_group_sample_bottomk",
    """SELECT o_orderstatus, o_orderkey FROM (
         SELECT o_orderstatus, o_orderkey,
                (CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296 AS h
         FROM orders)
       QUALIFY row_number() OVER (PARTITION BY o_orderstatus ORDER BY h, o_orderkey) <= 10""",
)
def b21c_group_sample_bottomk(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Uniform k-per-group sample WITHOUT RNG state: keep the k rows
    with the smallest Knuth-hash values per group (bottom-k sketch —
    the same order statistic KMV uses for cardinality). Deterministic,
    so the oracle is exact and re-runs/resumes pick identical rows;
    mergeable, so each batch contributes a ≤ k-row partial (the
    combiner) and the per-group reduce touches ≤ k × blocks rows,
    never the group's full population."""

    def partial(b: pa.Table) -> pa.Table:
        okey = b.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        h = (
            (okey.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        ).astype(np.int64)
        status = b.column("o_orderstatus").combine_chunks()
        codes = pc.index_in(status, value_set=status.unique()).to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, h, codes))
        codes_s = codes[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        keep = np.concatenate([order[s:min(s + k, e)] for s, e in zip(starts, ends)])
        t = b.append_column("h", pa.array(h))
        return t.take(pa.array(keep))

    def final(g: pa.Table) -> pa.Table:
        h = g.column("h").combine_chunks().to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((okey, h))[:k]
        return g.select(["o_orderstatus", "o_orderkey"]).take(pa.array(keep))

    return (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderkey"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderstatus")
        .map_groups(final, batch_format="pyarrow")
    )


# ------------------- B18c: grouped approx distinct (HLL per group)

@register("b18c_grouped_hll", None)  # approximate -> rows-only; tolerance
def b18c_grouped_hll(sf_dir: str) -> ray.data.Dataset:
    """Per-group distinct-customer estimate: one HLL register vector
    per (group, batch) — the combiner — merged per group by
    elementwise max. Shuffle volume is 4 KB × groups × blocks
    regardless of key cardinality; the grouped form of b18b, same
    registers, accuracy-tested vs exact per-group counts."""
    from ..functions.sketch import hll_estimate, hll_merge, hll_partial

    def partial(b: pa.Table) -> pa.Table:
        status = b.column("o_orderstatus").combine_chunks()
        uniq = status.unique()
        codes = pc.index_in(status, value_set=uniq).to_numpy(zero_copy_only=False)
        cust = b.column("o_custkey").combine_chunks()
        groups, regs = [], []
        for gi in range(len(uniq)):  # once per DISTINCT group in the batch
            groups.append(uniq[gi].as_py())
            regs.append(hll_partial(cust.filter(pa.array(codes == gi))).tolist())
        return pa.table(
            {
                "o_orderstatus": pa.array(groups, pa.string()),
                "regs": pa.array(regs, pa.list_(pa.uint8())),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        regs = hll_merge(
            [np.asarray(r, dtype=np.uint8) for r in g.column("regs").to_pylist()]
        )
        return pa.table(
            {
                "o_orderstatus": pa.array([g.column("o_orderstatus")[0].as_py()], pa.string()),
                "approx_distinct_custkeys": pa.array(
                    [int(round(hll_estimate(regs)))], pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderstatus", "o_custkey"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderstatus")
        .map_groups(merge, batch_format="pyarrow")
    )


# ------------------- B44: per-group mode (most frequent value)

@register(
    "b44_group_mode",
    """SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
         SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY 1, 2)
       QUALIFY row_number() OVER (PARTITION BY o_orderstatus ORDER BY cnt DESC, o_orderpriority) = 1""",
)
def b44_group_mode(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group MODE with a deterministic tie-break (smallest
    value wins): per-batch (group, value) counts — the combiner that
    shrinks the shuffle to distinct-pair cardinality — then one
    grouped Sum and a per-group argmax. Scale note: cost tracks
    distinct (group, value) pairs, not rows; for unbounded value
    domains switch to b41's MG sketch per group."""

    def precount(b: pa.Table) -> pa.Table:
        return b.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_orderstatus", "count")]
        ).rename_columns(["o_orderstatus", "o_orderpriority", "cnt"])

    def argmax(g: pa.Table) -> pa.Table:
        cnt = g.column("cnt_sum").combine_chunks().to_numpy(zero_copy_only=False)
        pri = g.column("o_orderpriority").combine_chunks().to_numpy(zero_copy_only=False)
        best = np.lexsort((pri, -cnt))[0]
        return pa.table(
            {
                "o_orderstatus": pa.array([g.column("o_orderstatus")[0].as_py()], pa.string()),
                "mode_priority": pa.array([pri[best]], pa.string()),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("cnt", alias_name="cnt_sum"))
        .groupby("o_orderstatus")
        .map_groups(argmax, batch_format="pyarrow")
    )


# ------------------- B45: funnel analysis (conditional grouped mins)

@register(
    "b45_funnel",
    """SELECT user_id, t_view, t_click, t_purchase FROM (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
         FROM events GROUP BY user_id)
       WHERE t_view < t_click AND t_click < t_purchase""",
)
def b45_funnel(sf_dir: str) -> ray.data.Dataset:
    """view -> click -> purchase funnel: users whose FIRST view precedes
    their first click precedes their first purchase. Entirely
    conditional grouped MINs — per-batch masked mins (the combiner)
    then one grouped Min per stage — so the shuffle carries three
    int64s per (user, block) and there is no per-user Python anywhere.
    The loose-funnel form; b45b_strict_funnel implements the strict
    ordering (click AFTER the qualifying view) with one sharded sweep."""
    stages = [("t_view", "view"), ("t_click", "click"), ("t_purchase", "purchase")]

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column("ts"), pa.int64())
        et = b.column("event_type")
        cols = {"user_id": b.column("user_id")}
        for alias, ev in stages:
            cols[alias] = pc.if_else(pc.equal(et, ev), ts_us, pa.scalar(None, pa.int64()))
        t = pa.table(cols)
        agg = t.group_by("user_id").aggregate([(a, "min") for a, _ in stages])
        return agg.rename_columns(["user_id"] + [a for a, _ in stages])

    def keep(b: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.less(b.column("t_view"), b.column("t_click")),
            pc.less(b.column("t_click"), b.column("t_purchase")),
        )
        return b.filter(pc.fill_null(ok, False))

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Min("t_view", alias_name="t_view"),
            Min("t_click", alias_name="t_click"),
            Min("t_purchase", alias_name="t_purchase"),
        )
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )


# ------------------- B46: edit-distance join (PassJoin segment blocking)

def _edit_le1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact ``levenshtein(a[i], b[i]) <= 1`` per pair, vectorized.

    Equal-length pairs (the dominant case): distance <= 1 iff at most
    one codepoint differs — one padded-matrix comparison (NUL padding
    is identical on both sides, so it never adds mismatches). Pairs
    with |len diff| == 1: distance is 1 iff deleting the first
    mismatching char of the longer yields the shorter (single indel);
    rare enough to check per pair. |len diff| >= 2 is never emitted by
    the blocking (length filter)."""
    la = np.fromiter((len(x) for x in a), np.int64, len(a))
    lb = np.fromiter((len(x) for x in b), np.int64, len(b))
    ok = np.zeros(len(a), bool)
    same = la == lb
    if same.any():
        w = max(int(la[same].max()), 1)
        A = np.asarray(a[same], dtype=f"U{w}").view(np.uint32).reshape(-1, w)
        B = np.asarray(b[same], dtype=f"U{w}").view(np.uint32).reshape(-1, w)
        ok[same] = (A != B).sum(axis=1) <= 1
    for i in np.nonzero(np.abs(la - lb) == 1)[0]:
        x, y = (a[i], b[i]) if la[i] < lb[i] else (b[i], a[i])
        j = 0
        while j < len(x) and x[j] == y[j]:
            j += 1
        ok[i] = y[:j] + y[j + 1 :] == x
    return ok


_ED_OUT_SCHEMA = pa.schema(
    [
        ("s_suppkey", pa.int64()),
        ("c_key", pa.int64()),
        ("s_name", pa.string()),
        ("c_name", pa.string()),
    ]
)


def _ed_emit(b: pa.Table, side: int) -> pa.Table:
    """PassJoin blocking rows for one batch of (rid, name), k = 1.

    Indexed side (side=0): each string contributes its k+1 = 2 segments
    keyed (target_len, seg_idx, seg_text). Probe side (side=1): for each
    candidate target length len±1 and segment, every substring of the
    segment's length whose start is within ±1 of the segment's home
    position — the pigeonhole guarantee that any string within edit
    distance 1 shares at least one key with its match. Strings of
    length <= k can't form k+1 non-empty segments, so the pigeonhole
    doesn't hold for them: they join a per-target-length SHORT class
    (segment index 2, empty segment text) that pairs every short build
    with every length-compatible probe — a bounded bucket the exact
    verify then filters (PassJoin's standard short-string rule).
    Length-grouped; each distinct (length, window) slice is ONE numpy
    matrix slice, no per-row Python string work."""
    from ..functions.hashing import polars_u64
    from ..stages.dedup import SHARDS

    ids = b.column("rid").combine_chunks().to_numpy(zero_copy_only=False)
    names = b.column("name").to_pylist()
    lens = np.fromiter((len(x) for x in names), np.int64, len(names))
    mix1, mix2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(1099511628211)
    outs = []

    def emit(idx: np.ndarray, arr: np.ndarray, tl: int, i: int, substrs: pa.Array) -> None:
        h64 = polars_u64(substrs)
        key = h64 * mix1 + np.uint64(tl) * mix2 + np.uint64(i)
        outs.append(
            pa.table(
                {
                    "shard": pa.array((key % np.uint64(SHARDS)).astype(np.int32), pa.int32()),
                    "key": pa.array(key.view(np.int64), pa.int64()),
                    "side": pa.array(np.full(len(idx), side, np.int8), pa.int8()),
                    "rid": pa.array(ids[idx], pa.int64()),
                    "name": pa.array(arr.tolist(), pa.string()),
                }
            )
        )

    for L in np.unique(lens):
        L = int(L)
        idx = np.nonzero(lens == L)[0]
        arr = np.asarray([names[i] for i in idx], dtype=object)
        empty_seg = pa.array([""] * len(idx), pa.string())
        if L >= 1:
            umat = np.asarray(arr.tolist(), dtype=f"U{L}")
            mat = umat.view(np.uint32).reshape(len(idx), L)

        def slice_str(start: int, ln: int) -> pa.Array:
            return pa.array(
                np.ascontiguousarray(mat[:, start : start + ln]).view(f"U{ln}").ravel()
            )

        if side == 0:
            if L <= 1:
                emit(idx, arr, L, 2, empty_seg)  # short class, keyed by own length
            else:
                h = L // 2
                emit(idx, arr, L, 0, slice_str(0, h))
                emit(idx, arr, L, 1, slice_str(h, L - h))
        else:
            for tl in (L - 1, L, L + 1):
                if tl < 0:
                    continue
                if tl <= 1:  # short-class targets: meet every short build of that length
                    emit(idx, arr, tl, 2, empty_seg)
                    continue
                th = tl // 2
                for i, (home, ln) in enumerate(((0, th), (th, tl - th))):
                    if not 0 < ln <= L:
                        continue
                    for st in range(max(0, home - 1), min(L - ln, home + 1) + 1):
                        emit(idx, arr, tl, i, slice_str(st, ln))
    if not outs:
        return pa.table(
            {
                "shard": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "rid": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(outs)


def _ed_pairs_shard(g: pa.Table) -> pa.Table:
    """One key-shard of blocking rows → exact-verified match rows.

    Sort by (key, side, rid), detect equal-key runs (each run = one
    complete blocking bucket; a key pins its shard), pair builds x
    probes inside each run, dedup pair ids within the shard, then the
    exact :func:`_edit_le1` verify — hash collisions and window
    over-generation die here, never in the output."""
    from ..stages.dedup import _key_runs

    n = g.num_rows
    if n < 2:
        return _ED_OUT_SCHEMA.empty_table()
    keys = g.column("key").to_numpy(zero_copy_only=False)
    side = g.column("side").to_numpy(zero_copy_only=False)
    rid = g.column("rid").to_numpy(zero_copy_only=False)
    names = np.asarray(g.column("name").to_pylist(), dtype=object)
    order = np.lexsort((rid, side, keys))
    keys, side, rid, names = keys[order], side[order], rid[order], names[order]
    a_idx, b_idx = [], []
    for s, e in zip(*_key_runs(keys)):
        builds = s + np.nonzero(side[s:e] == 0)[0]
        probes = s + np.nonzero(side[s:e] == 1)[0]
        if len(builds) and len(probes):
            a_idx.append(np.repeat(builds, len(probes)))
            b_idx.append(np.tile(probes, len(builds)))
    if not a_idx:
        return _ED_OUT_SCHEMA.empty_table()
    A, B = np.concatenate(a_idx), np.concatenate(b_idx)
    # same pair from both segments of one bucket run: dedup in-shard
    _, uniq = np.unique(np.stack([rid[A], rid[B]], axis=1), axis=0, return_index=True)
    A, B = A[uniq], B[uniq]
    keep = _edit_le1(names[A], names[B])
    A, B = A[keep], B[keep]
    return pa.table(
        {
            "s_suppkey": pa.array(rid[A], pa.int64()),
            "c_key": pa.array(rid[B], pa.int64()),
            "s_name": pa.array(names[A].tolist(), pa.string()),
            "c_name": pa.array(names[B].tolist(), pa.string()),
        },
        schema=_ED_OUT_SCHEMA,
    )


def edit_distance_join(
    build: ray.data.Dataset, probe: ray.data.Dataset
) -> ray.data.Dataset:
    """Distributed edit-distance-1 join of two (rid, name) Datasets:
    blocking emit on both sides → one sharded groupby → vectorized
    pair + exact verify per shard → cross-shard pair dedup."""
    b = build.map_batches(
        _ed_emit, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"side": 0}
    )
    p = probe.map_batches(
        _ed_emit, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"side": 1}
    )
    pairs = b.union(p).groupby("shard").map_groups(_ed_pairs_shard, batch_format="pyarrow")

    def first(g: pa.Table) -> pa.Table:  # cross-shard dedup; output is
        return g.slice(0, 1)  # bounded by TRUE matches, so per-pair cost is fine

    return pairs.groupby(["s_suppkey", "c_key"]).map_groups(first, batch_format="pyarrow")


@register(
    "b46_edit_distance_join",
    """WITH corrupted AS (
         SELECT s_suppkey AS c_key,
                substr(s_name, 1, 9 + (s_suppkey % 9)) || 'x' ||
                substr(s_name, 11 + (s_suppkey % 9)) AS c_name
         FROM supplier)
       SELECT s.s_suppkey, c.c_key, s.s_name, c.c_name
       FROM supplier s, corrupted c
       WHERE levenshtein(s.s_name, c.c_name) <= 1""",
)
def b46_edit_distance_join(sf_dir: str) -> ray.data.Dataset:
    """Approximate-string join: all (clean, corrupted) supplier-name
    pairs within edit distance 1, found WITHOUT the oracle's cross
    product.

    Blocking is PassJoin's pigeonhole (Li et al., ICDE 2011, public):
    split each indexed string into k+1 = 2 segments; any string within
    distance k of it must contain one segment EXACTLY, at a position
    shifted by at most k — so probes emit each segment-length substring
    whose start lies within ±k of the segment's home position, for each
    candidate target length in len±k (:func:`_ed_emit`). Candidates
    meet in a (segment-key-hash % SHARDS) groupby — dedup's
    sharded-bucket shape, one vectorized run-detection call per shard —
    and are verified with the EXACT distance predicate
    (:func:`_edit_le1`), so hash collisions and over-generation never
    reach the output and the DuckDB ``levenshtein`` oracle matches
    exactly.

    The corrupted side is synthesized in-query (deterministic one-char
    substitution mirroring the SQL expression, like text_pii_redact's
    planted PII) — the TPC-H tables carry no typos of their own.

    Scale note: pair generation is Σ_buckets |build|x|probe|; a shared
    constant prefix (here "Supplier#") makes its segment a hot bucket
    and degrades that bucket to verify-bound. Production mitigation:
    more, shorter segments (larger k+1) or entropy-aware segment
    boundaries; the verify stays exact either way."""

    def corrupt(b: pa.Table) -> pa.Table:
        keys = b.column("s_suppkey").combine_chunks().to_numpy(zero_copy_only=False)
        names = b.column("s_name").to_pylist()
        out = [
            nm[: 9 + (int(k) % 9)] + "x" + nm[10 + (int(k) % 9) :]
            for k, nm in zip(keys, names)
        ]
        return pa.table(
            {"rid": pa.array(keys, pa.int64()), "name": pa.array(out, pa.string())}
        )

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    build = sup.map_batches(
        lambda b: pa.table({"rid": b.column("s_suppkey"), "name": b.column("s_name")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    probe = sup.map_batches(corrupt, batch_format="pyarrow", zero_copy_batch=True)
    return edit_distance_join(build, probe)


# ------------------- B47: interval max-concurrency (distributed sweep-line)

@register(
    "b47_max_concurrency",
    """WITH b AS (
         SELECT ts AS t, 1 AS d FROM events
         UNION ALL
         SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS d FROM events),
       r AS (
         SELECT t, sum(d) OVER (ORDER BY t, d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         FROM b)
       SELECT date_trunc('hour', t) AS hour_ts,
              CAST(max(c) AS BIGINT) AS max_concurrent
       FROM r GROUP BY hour_ts""",
)
def b47_max_concurrency(sf_dir: str, duration_us: int = 1_800_000_000) -> ray.data.Dataset:
    """Peak concurrent 30-minute sessions per hour — the sweep-line
    algorithm, distributed as a two-pass global prefix sum (b40's
    range-partitioned shape composed with b36's run-base cumsum).

    Each event opens the interval [ts, ts+30min): boundaries are
    (+1 at start, -1 at end), concurrency is the running sum over
    boundaries ordered by (t, d) — d = -1 first at equal t, i.e.
    half-open intervals — and the per-hour output is the max of that
    running sum over the hour's boundaries. Pass A computes per-hour
    boundary-delta totals (per-batch combiner + one grouped Sum; the
    hour histogram is a driver-side scalar partial, never data), whose
    exclusive prefix gives every hour's entry concurrency. Pass B
    shuffles boundaries once on hour % SHARDS and, per shard, does one
    vectorized sort + cumsum with per-hour run-base subtraction plus
    the broadcast offsets — no per-hour Python. Tie semantics match
    the oracle's ROWS frame exactly: rows tied on (t, d) produce the
    same running-sum multiset under any tie order, so the per-hour max
    is deterministic.

    Scale note: offsets are one int64 per time bucket; at corpus scale
    pick the bucket width (minutes→hours→days) so the offset table
    stays broadcastable, exactly like b40's range walls."""
    from ..stages.dedup import SHARDS, _key_runs

    HOUR_US = 3_600_000_000

    def boundaries(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = np.concatenate([ts, ts + duration_us])
        d = np.concatenate(
            [np.ones(len(ts), np.int64), np.full(len(ts), -1, np.int64)]
        )
        bucket = t // HOUR_US
        return pa.table(
            {
                "t": pa.array(t, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "shard": pa.array((bucket % SHARDS).astype(np.int32), pa.int32()),
            }
        )

    bnds = _read(sf_dir, "events", ["ts"]).map_batches(
        boundaries, batch_format="pyarrow", zero_copy_batch=True
    )

    # Pass A: per-hour delta totals -> exclusive prefix = hour entry level.
    def bucket_sums(b: pa.Table) -> pa.Table:  # per-batch combiner
        g = b.select(["bucket", "d"]).group_by("bucket").aggregate([("d", "sum")])
        return g.rename_columns(["bucket", "d"])

    totals = _collect(
        bnds.map_batches(bucket_sums, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("d", alias_name="d_sum"))
    )
    buckets = totals.column("bucket").to_numpy(zero_copy_only=False)
    sums = totals.column("d_sum").to_numpy(zero_copy_only=False)
    order = np.argsort(buckets)
    buckets_sorted = buckets[order]
    offsets = np.r_[0, np.cumsum(sums[order])[:-1]]

    # Pass B: one shuffle on hour % SHARDS; vectorized sweep per shard.
    def sweep_shard(
        g: pa.Table, buckets_sorted: np.ndarray, offsets: np.ndarray
    ) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "hour_ts": pa.array([], pa.timestamp("us")),
                    "max_concurrent": pa.array([], pa.int64()),
                }
            )
        t = g.column("t").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        bucket = g.column("bucket").to_numpy(zero_copy_only=False)
        o = np.lexsort((d, t, bucket))
        bucket, d = bucket[o], d[o]
        t = t[o]
        cs = np.cumsum(d)
        starts, _ends = _key_runs(bucket)
        base = np.repeat(np.r_[0, cs[starts[1:] - 1]], np.diff(np.r_[starts, len(cs)]))
        entry = offsets[np.searchsorted(buckets_sorted, bucket[starts])]
        conc = cs - base + np.repeat(entry, np.diff(np.r_[starts, len(cs)]))
        peak = np.maximum.reduceat(conc, starts)
        return pa.table(
            {
                "hour_ts": pa.array(
                    (bucket[starts] * HOUR_US).astype("datetime64[us]"), pa.timestamp("us")
                ),
                "max_concurrent": pa.array(peak, pa.int64()),
            }
        )

    return bnds.groupby("shard").map_groups(
        sweep_shard,
        batch_format="pyarrow",
        fn_kwargs={"buckets_sorted": buckets_sorted, "offsets": offsets},
    )


# ------------------- B48: grouped OLS regression (sufficient statistics)

@register(
    "b48_grouped_regression",
    """WITH s AS (
         SELECT l_returnflag,
                count(*) AS n,
                SUM(CAST(l_quantity AS BIGINT)) AS sx,
                SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
                SUM(CAST(l_quantity AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy,
                SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag,
              n,
              (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents_per_unit
       FROM s""",
)
def b48_grouped_regression(sf_dir: str) -> ray.data.Dataset:
    """Per-group least-squares slope (price-cents vs quantity) from
    EXACT integer sufficient statistics — the mergeable-moments shape
    every streaming statistical aggregate (covariance, correlation,
    variance) shares.

    Each batch contributes one (n, Σx, Σy, Σxy, Σx²) row per group in
    int64 cents (Arrow group_by — exact, order-independent), one
    grouped Sum merges them, and the closed-form slope is a single
    float64 expression evaluated on identical integer operands in the
    SAME operation order as the oracle's SQL — so even the DOUBLE
    output hash-matches (the b36 exact-cents rule extended to second
    moments). Shuffle volume: 5 ints per (group, block). Scale note:
    Σxy here stays ≤ 2^53-exact through the float cast; corpus-scale
    sums need int128 / per-group offsetting, same as any exact-moments
    plan."""

    def partial(b: pa.Table) -> pa.Table:
        x = b.column("l_quantity").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # half-away, mirroring the oracle's ROUND() (ADVICE r3: np.round
        # is half-even — latent divergence on exact .5 cent products)
        y = _round_half_away(
            b.column("l_extendedprice").combine_chunks().to_numpy(zero_copy_only=False) * 100.0,
            0,
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        g = t.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns(["l_returnflag", "n", "sx", "sy", "sxy", "sxx"])

    def finalize(b: pa.Table) -> pa.Table:
        f = lambda c: b.column(c).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        n, sx, sy, sxy, sxx = f("n"), f("sx"), f("sy"), f("sxy"), f("sxx")
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "n": b.column("n"),
                "slope_cents_per_unit": pa.array(slope, pa.float64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )


# ------------------- B45b: strict-order funnel (sequential first-times)

@register(
    "b45b_strict_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t_view
                  FROM events WHERE event_type = 'view' GROUP BY user_id),
       c AS (SELECT e.user_id, min(e.ts) AS t_click
             FROM events e JOIN v USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > v.t_view
             GROUP BY e.user_id),
       p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             FROM events e JOIN c USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             GROUP BY e.user_id)
       SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
       FROM v JOIN c USING (user_id) JOIN p USING (user_id)""",
)
def b45b_strict_funnel(sf_dir: str) -> ray.data.Dataset:
    """STRICT-ordering funnel — the qualifying click must come after
    the first view, the qualifying purchase after that click (the
    semantics b45's loose conditional-MIN form defers to sessionize).

    Where the oracle needs three grouped-min CTEs and two join-backs,
    the distributed form is ONE shuffle: b27's shard shape (user_id %
    SHARDS, one Python call per shard), then per shard a vectorized
    3-step masked sweep — first view per user run (reduceat over a
    +inf-masked ts copy), first click with ts > that view (the
    per-user threshold broadcast back by run repeat), first purchase
    with ts > that click. No per-user Python, three masked reduceats
    total."""
    from ..stages.dedup import SHARDS, _key_runs

    INF = np.int64(2**62)

    def add_shard(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": pc.cast(b.column("ts"), pa.int64()),
                "event_type": b.column("event_type"),
                "shard": _key_shard(b.column("user_id"), SHARDS),
            }
        )

    def funnel_shard(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "t_view": pa.array([], pa.timestamp("us")),
                "t_click": pa.array([], pa.timestamp("us")),
                "t_purchase": pa.array([], pa.timestamp("us")),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        et = g.column("event_type").combine_chunks()
        is_stage = [
            pc.equal(et, s).to_numpy(zero_copy_only=False) for s in ("view", "click", "purchase")
        ]
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        is_stage = [m[order] for m in is_stage]
        starts, ends = _key_runs(uid)
        runs = np.repeat(np.arange(len(starts)), ends - starts)  # row -> user run

        def first_after(mask: np.ndarray, thresh: np.ndarray) -> np.ndarray:
            """Per user run: min ts among rows with mask AND ts > that
            run's threshold (+inf when none)."""
            t = np.where(mask & (ts > thresh[runs]), ts, INF)
            return np.minimum.reduceat(t, starts)

        zero = np.full(len(starts), -INF)
        t_view = first_after(is_stage[0], zero)
        t_click = first_after(is_stage[1], t_view)
        t_purchase = first_after(is_stage[2], t_click)
        keep = t_purchase < INF  # implies view and click exist too
        return pa.table(
            {
                "user_id": pa.array(uid[starts][keep], pa.int64()),
                "t_view": pa.array(t_view[keep].astype("datetime64[us]"), pa.timestamp("us")),
                "t_click": pa.array(t_click[keep].astype("datetime64[us]"), pa.timestamp("us")),
                "t_purchase": pa.array(
                    t_purchase[keep].astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(funnel_shard, batch_format="pyarrow")
    )


# ------------------- B49: scan-level predicate pushdown

@register(
    "b49_scan_pushdown",
    """SELECT l_orderkey, l_shipdate, l_extendedprice
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1998-09-01'""",
)
def b49_scan_pushdown(sf_dir: str) -> ray.data.Dataset:
    """Predicate pushed INTO the parquet scan: the filter is a
    pyarrow.dataset expression handed to ``read_parquet(filter=...)``,
    so row groups whose column statistics exclude the range are never
    read off storage and surviving row groups are filtered before the
    block leaves the read task — at 100 TB the difference between
    scanning a month and scanning the corpus. Every other query here
    prunes COLUMNS at the read; this one pins the ROW pushdown path
    (the b05 filter operator applies the same predicate post-read)."""
    import pyarrow.dataset as pads

    cutoff = pa.scalar(np.datetime64("1998-09-01T00:00:00", "us"), pa.timestamp("us"))
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice"],
        filter=(pads.field("l_shipdate") >= cutoff),
    )


# ------------------- B50: Count-Min point-frequency sketch

@register("b50_count_min", None)  # approximate -> rows-only; bounds tested
def b50_count_min(sf_dir: str) -> pa.Table:
    """Point-frequency estimates for a probe set of customers from a
    Count-Min sketch — the frequency sibling of b41's Misra-Gries:
    MG answers "which keys are frequent", CM answers "how often is
    THIS key" for any key, without ever shuffling the key space.
    One (4 x 16384) uint64 grid per block (the combiner), counter-
    addition merge driver-side (tree-merge at cluster scale), then one
    vectorized min-of-rows query per probe. Estimates are exact counts
    plus one-sided collision noise: true <= est <= true + (e/W)·N with
    probability 1 - e^-4 (bounds asserted in tests)."""
    from ..functions.sketch import cm_merge, cm_partial, cm_query

    def partial(b: pa.Table) -> pa.Table:
        grid = cm_partial(b.column("o_custkey").combine_chunks().cast(pa.string()))
        return pa.table({"grid": pa.array([grid.reshape(-1).view(np.int64).tolist()], pa.list_(pa.int64()))})

    from ..functions.sketch import CM_D, CM_W

    def merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: counter addition IS cm_merge (exact)."""
        if b.num_rows == 0:
            return pa.table({"grid": pa.array([], pa.list_(pa.int64()))})
        g = cm_merge(
            [
                np.asarray(x, dtype=np.int64).view(np.uint64).reshape(CM_D, CM_W)
                for x in b.column("grid").to_pylist()
            ]
        )
        return pa.table({"grid": pa.array([g.reshape(-1).view(np.int64).tolist()], pa.list_(pa.int64()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        merge,
    )
    grid = cm_merge(
        [np.asarray(p["grid"], dtype=np.int64).view(np.uint64).reshape(CM_D, CM_W) for p in parts]
    )
    probes = pa.array([str(k) for k in range(1, 21)], pa.string())
    est = cm_query(grid, probes)
    return pa.table({"o_custkey": probes.cast(pa.int64()), "est_orders": pa.array(est, pa.int64())})


# ======================= TPC-H tail: Q8/Q12/Q13/Q15/Q17/Q21/Q22 shapes
# (adapted to the trimmed testdata schema: no l_shipmode / l_commitdate
# / p_container columns, so Q12 uses shipdate-vs-orderdate lateness and
# Q21/Q22 use the columns that exist; the relational SHAPE each query
# exercises — conditional aggregates over a 6-way join, left-outer
# count distribution, argmax-on-aggregate, correlated-avg subquery,
# grouped argmax + regroup, scalar-subquery anti join — is the TPC-H
# one).


@register(
    "q08_market_share",
    """SELECT year(o_orderdate) AS o_year,
              ROUND(sum(CASE WHEN n2.n_name = 'NATION_7'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END), 4) AS nation_rev,
              ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
       FROM lineitem
         JOIN orders    ON l_orderkey = o_orderkey
         JOIN customer  ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region    ON n1.n_regionkey = r_regionkey
         JOIN supplier  ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
       WHERE r_name = 'ASIA'
       GROUP BY o_year""",
)
def q08_market_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q8 (national market share): per order-year, revenue from
    one supplier nation vs total, restricted to customers in one region.
    ONE large-large hash join (lineitem⋈orders); the four dimension hops
    (customer→nation→region, supplier→nation) collapse into two dense
    broadcast boolean arrays probed per batch; each batch reduces to
    per-year (nation_rev, total_rev) partials via bincount."""
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read_small(sf_dir, "region", ["r_regionkey", "r_name"])
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    asia_regions = set(
        region.filter(pc.equal(region.column("r_name"), "ASIA")).column("r_regionkey").to_pylist()
    )
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nat_in_region = np.zeros(int(nk.max()) + 1, dtype=bool)
    nat_in_region[nk] = np.isin(
        nation.column("n_regionkey").to_numpy(zero_copy_only=False), list(asia_regions)
    )
    target_nations = set(
        nation.filter(pc.equal(nation.column("n_name"), "NATION_7")).column("n_nationkey").to_pylist()
    )

    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cust_in_region = np.zeros(int(ck.max()) + 2, dtype=bool)
    cust_in_region[ck] = nat_in_region[
        cust.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    ]
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    supp_is_target = np.zeros(int(sk.max()) + 2, dtype=bool)
    supp_is_target[sk] = np.isin(
        supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64),
        list(target_nations),
    )
    ref = ray.put((cust_in_region, supp_is_target))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table, ref=ref) -> pa.Table:
        cust_in_region, supp_is_target = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        c = np.clip(
            b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(cust_in_region) - 1,
        )
        m = cust_in_region[c]
        if not m.any():
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "nation_rev": pa.array([], pa.float64()),
                    "total_rev": pa.array([], pa.float64()),
                }
            )
        b = b.filter(pa.array(m))
        s = np.clip(
            b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(supp_is_target) - 1,
        )
        is_target = supp_is_target[s]
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        year = (
            pc.year(b.column("o_orderdate")).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        y0 = year.min()
        idx = year - y0
        total = np.bincount(idx, weights=rev)
        nat = np.bincount(idx, weights=np.where(is_target, rev, 0.0))
        present = np.nonzero(np.bincount(idx))[0]
        return pa.table(
            {
                "o_year": pa.array(present + y0, pa.int64()),
                "nation_rev": pa.array(nat[present], pa.float64()),
                "total_rev": pa.array(total[present], pa.float64()),
            }
        )

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nation_rev", alias_name="nation_rev"), Sum("total_rev", alias_name="total_rev"))
    )
    return _round_cols(out, {"nation_rev": 4, "total_rev": 4})


@register(
    "q12_late_lineitems",
    """SELECT o_orderpriority,
              CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
              count(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
)
def q12_late_lineitems(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q12 shape (shipping lateness by priority; the trimmed
    schema has no l_shipmode/commitdate, so 'late' = shipped more than
    90 days after the order date). One hash join, then each batch
    collapses to at most 5 (priority, late, total) partial rows — pure
    integer counts, exact at any scale. The oracle CASTs its CASE-sum
    back to BIGINT (DuckDB integer SUM yields HUGEINT)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    lag = np.timedelta64(90, "D")

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        odate = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        late = pa.array(ship > (odate + lag))
        t = pa.table({"o_orderpriority": b.column("o_orderpriority"), "late": pc.cast(late, pa.int64())})
        g = t.group_by(["o_orderpriority"]).aggregate([("late", "sum"), ("late", "count")])
        return g.rename_columns(["o_orderpriority", "late_count", "n_items"])

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("late_count", alias_name="late_count"), Sum("n_items", alias_name="n_items"))
    )


@register(
    "q13_customer_distribution",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey) cc
       GROUP BY c_count""",
)
def q13_customer_distribution(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q13 (customer order-count distribution): per-batch count
    combiner over orders → grouped Sum per custkey → LEFT OUTER join to
    customer so order-less customers survive as NULL→0 → second grouped
    count over the distribution key. Both shuffles move one row per
    (batch, key) / per customer — never the fact table."""
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n"])

    counts = (
        orders.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = cust.join(
        counts,
        join_type="left_outer",
        num_partitions=_join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fill(b: pa.Table) -> pa.Table:
        c = pc.coalesce(pc.cast(b.column("c_count"), pa.int64()), pa.scalar(0, pa.int64()))
        t = pa.table({"c_count": c})
        g = t.group_by(["c_count"]).aggregate([("c_count", "count")])
        return g.rename_columns(["c_count", "custdist"])

    return (
        j.map_batches(fill, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )


@register(
    "q15_top_supplier",
    """WITH rev AS (SELECT l_suppkey,
                           ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                      AND l_shipdate <  TIMESTAMP '1996-04-01'
                    GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_rev
       FROM supplier JOIN rev ON s_suppkey = l_suppkey
       WHERE total_rev = (SELECT max(total_rev) FROM rev)""",
)
def q15_top_supplier(sf_dir: str) -> pa.Table:
    """TPC-H Q15 (top supplier by quarterly revenue): combiner-first
    grouped sum per suppkey over the shipdate slice, 4-decimal rounding
    (exact — disc-prices are exact 4-decimal values, see _round_cols),
    then an argmax-equality filter like q02 and a broadcast name attach.
    The revenue table is supplier-cardinality, so the max + filter runs
    on a dimension-scale Dataset."""
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def pre(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        m = (ship >= lo) & (ship < hi)
        b = b.filter(pa.array(m))
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_suppkey": b.column("l_suppkey"),
                "rev": pa.array(price * (1.0 - disc), pa.float64()),
            }
        )
        g = t.group_by(["l_suppkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_suppkey", "rev"])

    rev = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .aggregate(Sum("rev", alias_name="rev"))
    )
    tables = [
        t for t in ray.get(_round_cols(rev, {"rev": 4}).to_arrow_refs()) if t.num_rows > 0
    ]
    empty_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("total_rev", pa.float64())]
    )
    if not tables:  # no lineitem in the window → empty result, like the oracle
        return empty_schema.empty_table()
    rev = pa.concat_tables(tables, promote_options="default")
    total = rev.column("rev").to_numpy(zero_copy_only=False)
    best = total.max()
    winners = rev.filter(pa.array(total == best))

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    names = np.empty(int(sk.max()) + 1, dtype=object)
    names[sk] = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    wk = winners.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "s_suppkey": pa.array(wk, pa.int64()),
            "s_name": pa.array(list(names[wk]), pa.string()),
            "total_rev": winners.column("rev"),
        }
    )


@register(
    "q17_small_quantity",
    """SELECT ROUND(sum(l_extendedprice), 2) AS total_price, count(*) AS n_rows
       FROM lineitem l JOIN part p ON p_partkey = l_partkey
       WHERE p_brand = 'Brand#1'
         AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""",
)
def q17_small_quantity(sf_dir: str) -> pa.Table:
    """TPC-H Q17 (small-quantity revenue): a correlated per-part AVG
    subquery. Pass 1 computes (sum_qty, count) per partkey with per-batch
    combiners (part-cardinality result → dense broadcast arrays); pass 2
    filters lineitem vectorized against 0.5·avg and reduces to one
    (sum, count) partial per batch. Quantities are integer-valued, so
    every partial sum is exact in float64 and the avg division is the
    SAME IEEE operation DuckDB performs — the float threshold compare
    is bit-identical, not approximately equal."""

    def qpre(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey"]).aggregate([("l_quantity", "sum"), ("l_quantity", "count")])
        return g.rename_columns(["l_partkey", "sum_qty", "n_qty"])

    per_part = _collect(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(qpre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_qty", alias_name="n_qty"))
    )
    pk = per_part.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand"])
    ppk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    maxk = int(max(pk.max(), ppk.max()))
    thr = np.full(maxk + 2, -np.inf)  # no stats → no row passes qty < thr
    thr[pk] = 0.5 * (
        per_part.column("sum_qty").to_numpy(zero_copy_only=False)
        / per_part.column("n_qty").to_numpy(zero_copy_only=False)
    )
    brand = np.zeros(maxk + 2, dtype=bool)
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    brand[ppk[brands == "Brand#1"]] = True
    ref = ray.put((thr, brand))

    def partial(b: pa.Table, ref=ref) -> pa.Table:
        thr, brand = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = np.clip(
            b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64), 0, len(thr) - 1
        )
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        m = brand[k] & (qty < thr[k])
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "total_price": pa.array([float(price[m].sum())], pa.float64()),
                "n_rows": pa.array([int(m.sum())], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    parts = _tree_fold(parts, _sum_merge)
    total = float(_round_half_away(np.array([sum(p["total_price"] for p in parts)]), 2)[0])
    return pa.table(
        {
            "total_price": pa.array([total], pa.float64()),
            "n_rows": pa.array([sum(p["n_rows"] for p in parts)], pa.int64()),
        }
    )


@register(
    "q21_blocking_supplier",
    """WITH mx AS (SELECT l_orderkey AS okey, max(l_shipdate) AS max_ship
                   FROM lineitem GROUP BY l_orderkey),
         last AS (SELECT DISTINCT l_orderkey, l_suppkey
                  FROM lineitem JOIN mx
                    ON l_orderkey = okey AND l_shipdate = max_ship)
       SELECT s_suppkey, s_name, count(*) AS n_blocking
       FROM last JOIN supplier ON s_suppkey = l_suppkey
       GROUP BY s_suppkey, s_name""",
)
def q21_blocking_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q21 shape (which supplier shipped LAST on each order —
    the order's blocker), as a grouped argmax + regroup in ONE shuffle:
    co-shuffle (orderkey, suppkey, shipdate) on orderkey % SHARDS, one
    vectorized pass per shard finds each order run's max shipdate and
    keeps the distinct (order, supplier) argmax pairs, then a per-batch
    count combiner + grouped Sum per supplier and a broadcast name
    attach. Dates and counts are exact integers end-to-end."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("l_orderkey"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "okey": key,
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "ship": b.column("l_shipdate"),
            }
        )

    def argmax_shard(group: pa.Table) -> pa.Table:
        ok = group.column("okey").combine_chunks().to_numpy(zero_copy_only=False)
        sk = group.column("skey").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ship").combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        if len(ok) == 0:
            return pa.table({"skey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        order = np.lexsort((ts, ok))
        ok, sk, ts = ok[order], sk[order], ts[order]
        starts = np.nonzero(np.r_[True, ok[1:] != ok[:-1]])[0]
        run_max = np.maximum.reduceat(ts, starts)
        keep = ts == np.repeat(run_max, np.diff(np.r_[starts, len(ok)]))
        pairs = np.unique(np.stack([ok[keep], sk[keep]], axis=1), axis=0)
        sup, cnt = np.unique(pairs[:, 1], return_counts=True)
        return pa.table({"skey": pa.array(sup, pa.int64()), "n": pa.array(cnt, pa.int64())})

    counts = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(argmax_shard, batch_format="pyarrow")
        .groupby("skey")
        .aggregate(Sum("n", alias_name="n_blocking"))
    )

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    names = np.empty(int(sk.max()) + 2, dtype=object)
    names[sk] = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    ref = ray.put(names)

    def attach(b: pa.Table, ref=ref) -> pa.Table:
        names = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = b.column("skey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(k, pa.int64()),
                "s_name": pa.array(list(names[np.clip(k, 0, len(names) - 1)]), pa.string()),
                "n_blocking": b.column("n_blocking"),
            }
        )

    return counts.map_batches(attach, batch_format="pyarrow")


@register(
    "q22_idle_rich_customers",
    """WITH stats AS (SELECT count(*) AS cnt,
                             sum(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS total_cents
                      FROM customer WHERE c_acctbal > 0)
       SELECT c_custkey, c_name, c_acctbal
       FROM customer
       WHERE c_acctbal > 0
         AND CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) * (SELECT cnt FROM stats)
             > (SELECT total_cents FROM stats)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
)
def q22_idle_rich_customers(sf_dir: str) -> pa.Table:
    """TPC-H Q22 shape (above-average-balance customers with no
    qualifying orders): the global-average filter runs in EXACT integer
    cents — bal·100·count > Σcents avoids the order-dependent float
    mean entirely (both sides of the oracle use the same integers) —
    and the NOT EXISTS is the broadcast anti join (urgent orders'
    custkeys ship once via ray.put, vectorized is_in per batch).
    Schema-pinned collect: the survivor set can be small/empty."""

    def stats_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        pos = bal[bal > 0]
        cents = _round_half_away(pos * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "cnt": pa.array([len(pos)], pa.int64()),
                "cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    parts = _tree_fold(
        _read(sf_dir, "customer", ["c_acctbal"]).map_batches(
            stats_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        _sum_merge,
    )
    cnt = sum(p["cnt"] for p in parts)
    total_cents = sum(p["cents"] for p in parts)

    # Urgent custkeys are bounded by |customers| (a dimension), but
    # orders is a FACT table — distill the key set distributed (per-
    # batch filter + unique combiner), never _read_small the fact.
    def urgent_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT"))
        return pa.table({"k": pc.unique(b.column("o_custkey").combine_chunks())})

    urgent_keys = _distill_keys(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            urgent_pre, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    key_ref = ray.put(pa.array(urgent_keys, pa.int64()))

    def fn(b: pa.Table, ref=key_ref, cnt=cnt, total=total_cents) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = _round_half_away(bal * 100.0, 0).astype(np.int64)
        rich = (bal > 0) & (cents * cnt > total)
        idle = pc.invert(pc.is_in(b.column("c_custkey"), value_set=keys)).to_numpy(
            zero_copy_only=False
        )
        return b.filter(pa.array(rich & idle)).select(["c_custkey", "c_name", "c_acctbal"])

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
    schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_acctbal", pa.float64())]
    )
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    return pa.concat_tables([t.cast(schema) for t in tables]) if tables else schema.empty_table()


# --------------------------- B51: DENSE_RANK (completes the rank family)

@register(
    "b51_dense_rank",
    """SELECT user_id, event_type, n_events, dr
       FROM (SELECT user_id, event_type, count(*) AS n_events,
                    DENSE_RANK() OVER (PARTITION BY user_id
                                       ORDER BY count(*) DESC) AS dr
             FROM events GROUP BY user_id, event_type) t""",
)
def b51_dense_rank(sf_dir: str) -> ray.data.Dataset:
    """DENSE_RANK over a grouped aggregate (per-user event-type counts
    ranked by frequency): count combiner + grouped Sum shrinks events to
    (user, type) cardinality, then the b27 shard shape ranks each user
    run in one vectorized pass — dense rank = cumsum of value-change
    flags with per-run base subtraction; ties (equal counts) share a
    rank with NO order dependence, so the result is deterministic
    without a tie-break column. Completes the window-rank family
    (ROW_NUMBER b40, NTILE b35, LAG b34, running SUM b36)."""
    from ..stages.dedup import SHARDS

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate([("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "n"])

    counts = (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("n_events"), pa.int64()),
            }
        )

    def rank_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = group.column("n_events").combine_chunks().to_numpy(zero_copy_only=False)
        et = group.column("event_type").combine_chunks()
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "dr": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((-n, uid))
        uid, n = uid[order], n[order]
        et = et.take(pa.array(order))
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        new_val = new_user | np.r_[False, n[1:] != n[:-1]]
        csum = np.cumsum(new_val)
        run_base = csum[np.nonzero(new_user)[0]] - 1
        runs = np.diff(np.r_[np.nonzero(new_user)[0], len(uid)])
        dr = csum - np.repeat(run_base, runs)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_type": et,
                "n_events": pa.array(n, pa.int64()),
                "dr": pa.array(dr, pa.int64()),
            }
        )

    return (
        counts.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
    )


# ------------- B11e: AUTO skew join (MG heat probe routes hot keys)

@register(
    "b11e_skew_join_auto",
    """WITH probe AS (SELECT user_id, value FROM events
                      UNION ALL
                      SELECT 1 AS user_id, l_extendedprice AS value
                      FROM lineitem),
         dim AS (SELECT c_custkey AS user_id, c_name FROM customer)
       SELECT p.user_id, d.c_name, p.value
       FROM probe p JOIN dim d ON p.user_id = d.user_id""",
)
def b11e_skew_join_auto(sf_dir: str) -> ray.data.Dataset:
    """AUTOMATIC skew-handling join (the AQE pattern, PARTIAL salting):
    a Misra-Gries pass over the probe keys (1 KB per block, counter-
    addition merge) finds keys whose estimated share alone would fill
    half a reducer (est ≥ rows / (2·shuffle_width)). Then ONE join pass:
    probe rows on a hot key take a round-robin salt so the key fans
    out across `salts` reducers; everything else salts 0; the build
    side replicates ONLY its hot-key rows once per salt. Versus b11d
    (every build row × salts) the replication cost collapses to
    |hot dim rows| × salts, and versus a two-path hot/cold split the
    probe is scanned once for the join (Ray re-executes lazy branches,
    so a split pays the probe scan per consumer — measured 2.3× the
    plain join's wall at sf0.1 vs 1.5× for this plan, where the extra
    0.5× IS the heat-probe scan: the cost of not knowing the histogram
    in advance. At sandbox scale the hot key never saturates a reducer
    so the plain join stays ahead; the payoff is at cluster scale,
    where an 86%-share key serializes one reducer for the whole
    probe's worth of work while this plan caps any reducer at ~1/salts
    of it).
    The probe here is CONSTRUCTED skewed in a SQL-expressible way
    (every lineitem row re-keyed to user 1: ~86% of probe rows on one
    key) so the salted path is actually exercised and oracle-checked;
    events' uniform keys exercise the unsalted path. Answer is
    oracle-identical to the plain join; only the reducer layout
    differs."""
    from ..functions.sketch import mg_compress, mg_merge

    salts = _join_partitions()
    events = _read(sf_dir, "events", ["user_id", "value"])

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "value": b.column("l_extendedprice"),
            }
        )

    hot_slice = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        rekey, batch_format="pyarrow", zero_copy_batch=True
    )

    def cast_probe(b: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": pc.cast(b.column("user_id"), pa.int64()), "value": b.column("value")}
        )

    probe = events.map_batches(cast_probe, batch_format="pyarrow", zero_copy_batch=True).union(
        hot_slice
    )

    # Heat probe: one MG partial per block, merged driver-side (the
    # b41 sketch as a *planner input* rather than a query result).
    def heat(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column("user_id").combine_chunks())
        items, counts = mg_compress(
            vc.field("values").to_numpy(zero_copy_only=False),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "items": pa.array([items.tolist()], pa.list_(pa.int64())),
                "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    def heat_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: mg_merge is Misra-Gries' own mergeable op
        (plan-only input — the join output is invariant to it)."""
        it, ct = mg_merge(
            [
                (np.asarray(i, dtype=np.int64), np.asarray(c, dtype=np.int64))
                for i, c in zip(b.column("items").to_pylist(), b.column("counts").to_pylist())
            ]
        )
        return pa.table(
            {
                "items": pa.array([it.tolist()], pa.list_(pa.int64())),
                "counts": pa.array([ct.tolist()], pa.list_(pa.int64())),
                "n": pa.array([int(pc.sum(b.column("n")).as_py() or 0)], pa.int64()),
            }
        )

    parts = _tree_fold(probe.map_batches(heat, batch_format="pyarrow"), heat_merge)
    total = sum(p["n"] for p in parts)
    if parts:
        items, counts = mg_merge(
            [
                (np.asarray(p["items"], dtype=np.int64), np.asarray(p["counts"], dtype=np.int64))
                for p in parts
            ]
        )
        threshold = max(1, total // (2 * salts))
        hot = np.sort(items[counts >= threshold])
    else:  # empty probe: no heat, plain (trivially empty) join below
        hot = np.array([], dtype=np.int64)
    hot_ref = ray.put(pa.array(hot, pa.int64()))

    def salt_probe(b: pa.Table, ref=hot_ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        is_hot = pc.is_in(b.column("user_id"), value_set=keys).to_numpy(zero_copy_only=False)
        salt = np.zeros(b.num_rows, dtype=np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum()), dtype=np.int64) % salts
        return b.append_column("salt", pa.array(salt))

    def salt_dim(b: pa.Table, ref=hot_ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b = pa.table(
            {"user_id": pc.cast(b.column("c_custkey"), pa.int64()), "c_name": b.column("c_name")}
        )
        is_hot = pc.is_in(b.column("user_id"), value_set=keys)
        cold = b.filter(pc.invert(is_hot)).append_column(
            "salt", pa.array(np.zeros(b.num_rows - int(pc.sum(is_hot).as_py() or 0), np.int64))
        )
        hot_rows = b.filter(is_hot)
        n = hot_rows.num_rows
        rep = hot_rows.take(pa.array(np.tile(np.arange(n), salts)))
        rep = rep.append_column("salt", pa.array(np.repeat(np.arange(salts, dtype=np.int64), n)))
        return pa.concat_tables([cold, rep])

    salted_probe = probe.map_batches(salt_probe, batch_format="pyarrow")
    salted_dim = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        salt_dim, batch_format="pyarrow", zero_copy_batch=True
    )
    j = salted_probe.join(
        salted_dim,
        join_type="inner",
        num_partitions=salts,
        on=("user_id", "salt"),
        right_on=("user_id", "salt"),
    )
    return j.select_columns(["user_id", "c_name", "value"])


# --------------- B52: bounded window-frame aggregate (moving sum/count)

@register(
    "b52_moving_frame",
    """SELECT user_id, event_id,
              CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS frame_cents,
              count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_n
       FROM (SELECT user_id, ts, event_id,
                    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
             FROM events) t""",
)
def b52_moving_frame(sf_dir: str) -> ray.data.Dataset:
    """BOUNDED window frame (ROWS 3 PRECEDING — the moving-average
    shape), completing the frame family: b36 is the UNBOUNDED prefix,
    this is the sliding band. Same one-shuffle shard shape; inside each
    shard one global cumsum serves every user run — frame sum =
    csum[i] − csum[frame_lo−1], where frame_lo clamps to the run start
    (subtracting the PREVIOUS run's prefix exactly cancels the carried
    cumsum, so runs never need separate passes). Values go through the
    oracle's own ROUND(·,0) half-away rule into exact integer cents;
    output is (sum, count), not the float mean, so every byte is
    integer-exact."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        cents = _round_half_away(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def frame_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "frame_cents": pa.array([], pa.int64()),
                    "frame_n": pa.array([], pa.int64()),
                }
            )
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        cents = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        width = np.minimum(pos, 3) + 1
        csum = np.cumsum(cents)
        lo = np.arange(n) - width  # global index just before the frame
        frame = csum - np.where(lo >= 0, csum[np.maximum(lo, 0)], 0)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(eid, pa.int64()),
                "frame_cents": pa.array(frame, pa.int64()),
                "frame_n": pa.array(width, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(frame_shard, batch_format="pyarrow")
    )


# -------- B40b: ROW_NUMBER over quantile-derived range partitions

@register(
    "b40b_row_number_rangepart",
    """SELECT event_id,
              ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
       FROM events""",
)
def b40b_row_number_rangepart(sf_dir: str, n_parts: int = 16) -> ray.data.Dataset:
    """b40's global ROW_NUMBER with PRODUCTION boundaries: instead of
    fixed hour walls, the bucket edges come from a one-pass mergeable
    quantile sketch over ts (stages/partition.py), so the buckets are
    ≈ equal-row on ANY time distribution — a bursty corpus can no
    longer pile 90% of rows into one wall-clock hour's reducer. Same
    two-pass rank: per-bucket counts → broadcast exclusive prefix →
    local sort + offset. Correctness is boundary-independent (the
    oracle is identical to b40's); the sketch only buys balance."""
    from ..stages.partition import assign_range_partition, quantile_range_boundaries

    ev = _read(sf_dir, "events", ["event_id", "ts"])
    bounds = quantile_range_boundaries(
        ev, "ts", n_parts, _cast=lambda x: x.astype("datetime64[us]").view(np.int64)
    )

    def bucketize(b: pa.Table) -> pa.Table:
        ts = (
            b.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        return b.append_column("bucket", pa.array(assign_range_partition(ts, bounds)))

    ev = ev.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    counts = {r["bucket"]: r["count()"] for r in ev.groupby("bucket").count().take_all()}
    offsets, acc = {}, 0
    for bkt in sorted(counts):
        offsets[bkt] = acc
        acc += counts[bkt]

    def assign(g: pa.Table) -> pa.Table:
        ts = g.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        base = offsets[g.column("bucket")[0].as_py()]
        rn = np.empty(len(eid), dtype=np.int64)
        rn[order] = base + 1 + np.arange(len(eid), dtype=np.int64)
        return pa.table({"event_id": g.column("event_id"), "rn": pa.array(rn)})

    return ev.groupby("bucket").map_groups(assign, batch_format="pyarrow")


# ----------------------- B53: referential-integrity (FK orphan) audit

@register(
    "b53_fk_audit",
    """SELECT rel, orphans FROM (
         SELECT 'orders.custkey' AS rel, count(*) AS orphans
         FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
         UNION ALL
         SELECT 'lineitem.orderkey', count(*)
         FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
         UNION ALL
         SELECT 'lineitem.partkey', count(*)
         FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
         UNION ALL
         SELECT 'lineitem.suppkey', count(*)
         FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
         UNION ALL
         SELECT 'customer.nationkey', count(*)
         FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
       ) t""",
)
def b53_fk_audit(sf_dir: str) -> pa.Table:
    """Data-quality audit: orphan counts for every foreign-key edge of
    the star schema, in one row per relationship. Two physical shapes,
    chosen by PARENT size exactly as a 100-TB run must: dimension
    parents (customer/part/supplier/nation) broadcast their key set
    once and each child batch anti-probes with a vectorized is_in,
    collapsing to one partial count per batch; the fact-sized parent
    (orders, for lineitem.orderkey) would never fit a broadcast, so
    that edge is the b13c co-partitioned left_anti join with per-batch
    pre-distinct, counted distributed. Counts are exact integers."""

    def _orphans_broadcast(child: str, ckey: str, parent: str, pkey: str) -> int:
        keys = pc.unique(_read_small(sf_dir, parent, [pkey]).column(pkey).combine_chunks())
        ref = ray.put(keys)

        def part(b: pa.Table, ref=ref) -> pa.Table:
            ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            miss = pc.invert(pc.is_in(pc.cast(b.column(ckey), ks.type), value_set=ks))
            return pa.table({"n": pa.array([pc.sum(miss).as_py() or 0], pa.int64())})

        rows = _tree_fold(
            _read(sf_dir, child, [ckey]).map_batches(
                part, batch_format="pyarrow", zero_copy_batch=True
            ),
            _sum_merge,
        )
        return sum(r["n"] for r in rows)

    def _orphans_antijoin() -> int:
        li = _read(sf_dir, "lineitem", ["l_orderkey"])

        def pre(b: pa.Table) -> pa.Table:
            return b.group_by(["l_orderkey"]).aggregate([]).rename_columns(["l_orderkey"])

        child_keys = li.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        parents = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
            lambda b: b.group_by(["o_orderkey"]).aggregate([]).rename_columns(["l_orderkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        orphan_keys = child_keys.join(
            parents, join_type="left_anti", num_partitions=_join_partitions(), on=("l_orderkey",)
        )
        bad = {r["l_orderkey"] for r in orphan_keys.take_all()}
        if not bad:
            return 0
        ref = ray.put(pa.array(sorted(bad), pa.int64()))

        def cnt(b: pa.Table, ref=ref) -> pa.Table:
            ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            hit = pc.is_in(b.column("l_orderkey"), value_set=ks)
            return pa.table({"n": pa.array([pc.sum(hit).as_py() or 0], pa.int64())})

        rows = _tree_fold(
            li.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True), _sum_merge
        )
        return sum(r["n"] for r in rows)

    rels = [
        ("orders.custkey", _orphans_broadcast("orders", "o_custkey", "customer", "c_custkey")),
        ("lineitem.orderkey", _orphans_antijoin()),
        ("lineitem.partkey", _orphans_broadcast("lineitem", "l_partkey", "part", "p_partkey")),
        ("lineitem.suppkey", _orphans_broadcast("lineitem", "l_suppkey", "supplier", "s_suppkey")),
        ("customer.nationkey", _orphans_broadcast("customer", "c_nationkey", "nation", "n_nationkey")),
    ]
    return pa.table(
        {
            "rel": pa.array([r[0] for r in rels], pa.string()),
            "orphans": pa.array([int(r[1]) for r in rels], pa.int64()),
        }
    )


# ------------- TS1: time-series resample + forward fill (gap filling)

@register(
    "ts_resample_ffill",
    """WITH ev AS (
         SELECT user_id, value,
                date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
         FROM events),
       evd AS (
         SELECT user_id, sec, value FROM (
           SELECT *, row_number() OVER (
               PARTITION BY user_id, sec ORDER BY i DESC) AS rn
           FROM ev) WHERE rn = 1),
       b AS (SELECT user_id, min(sec) // 3600 AS lo_h, max(sec) // 3600 AS hi_h
             FROM ev GROUP BY user_id),
       grid AS (SELECT user_id, unnest(generate_series(lo_h, hi_h)) AS h FROM b),
       probe AS (SELECT user_id, h, h * 3600 + 3599 AS g_sec FROM grid)
       SELECT p.user_id,
              make_timestamp(p.h * 3600 * 1000000) AS bucket,
              e.value AS value
       FROM probe p ASOF JOIN evd e
         ON p.user_id = e.user_id AND e.sec <= p.g_sec""",
)
def ts_resample_ffill(sf_dir: str) -> ray.data.Dataset:
    """Per-user HOURLY resampling with forward fill: each user's events
    project onto a regular grid from their first to their last hour;
    every grid point carries the latest value at or before it. The
    missing time-series family member next to b26 (tumbling agg),
    b14 (as-of) and b27 (sessionize).

    One sharded shuffle, then a FULLY vectorized pass per shard — the
    ragged per-user grids build with the repeat/cumsum arange trick and
    resolve with ONE searchsorted per shard over a composite
    (user_id << 34 | epoch_seconds) key, so a grid point can never
    match a neighboring user's events and no per-user Python loop
    exists. Grid size is bounded by span-hours, so a single user with a
    year of history adds ~9k rows, not a blowup; the composite key
    needs user_id < 2^29 and epoch < 2^34 s (year ~2514), asserted."""
    from ..stages.dedup import SHARDS

    HOUR = np.int64(3600)

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def resample_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.timestamp("us")),
                    "value": pa.array([], pa.float64()),
                }
            )
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts_s = ts // 1_000_000
        if not (
            (uid >= 0).all()
            and (uid < (1 << 29)).all()
            and (ts_s >= 0).all()
            and (ts_s < (1 << 34)).all()
        ):
            # load-bearing for the composite (uid << 34 | ts_s) key below;
            # raise (not assert) so `python -O` cannot silently mis-pack
            # (negative uids would wrap the int64 shift positive and
            # break the searchsorted ordering silently)
            raise ValueError("user_id must be in [0, 2^29) and ts within [1970, ~2514)")
        # event_id breaks exact-(user, ts) ties: without it the filled
        # value would follow shuffle delivery order (layout-dependent).
        order = np.lexsort((eid, ts, uid))
        uid, ts_s, val = uid[order], ts_s[order], val[order]
        key = (uid << 34) | ts_s
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        ends = np.r_[starts[1:], n]
        lo_h = ts_s[starts] // HOUR  # first hour per user
        hi_h = ts_s[ends - 1] // HOUR  # last hour per user
        lens = (hi_h - lo_h + 1).astype(np.int64)
        total = int(lens.sum())
        # Ragged arange: grid hour offsets 0..len_i-1 per user, flat.
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        g_uid = np.repeat(uid[starts], lens)
        g_sec = (np.repeat(lo_h, lens) + off) * HOUR + (HOUR - 1)
        # End-of-hour probe: "latest value at or before bucket close".
        g_key = (g_uid << 34) | g_sec
        idx = np.searchsorted(key, g_key, side="right") - 1
        run_start = np.repeat(starts, lens)
        filled = idx >= run_start  # first hour always has >=1 event
        v = np.where(filled, val[np.maximum(idx, 0)], np.nan)
        return pa.table(
            {
                "user_id": pa.array(g_uid, pa.int64()),
                "bucket": pa.array(
                    ((np.repeat(lo_h, lens) + off) * HOUR * 1_000_000).astype(
                        "datetime64[us]"
                    ),
                    pa.timestamp("us"),
                ),
                "value": pa.array(v, pa.float64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(resample_shard, batch_format="pyarrow")
    )


# ---------------- TPC-H tail completion: Q9/Q11/Q16/Q20 shapes.
# The testdata schema has no partsupp table, so each query keeps the
# TPC-H *relational shape* over the columns that exist: Q9 costs parts
# at p_retailprice instead of ps_supplycost, Q11's value share runs
# over lineitem revenue instead of partsupp stock value, Q16 counts
# distinct lineitem suppliers instead of partsupp suppliers, and Q20's
# available-quantity threshold becomes a share-of-part-total threshold.


@register(
    "q09_product_profit",
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
              ROUND(sum(l_extendedprice * (1 - l_discount)
                        - p_retailprice * l_quantity), 4) AS profit
       FROM lineitem
         JOIN part     ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN orders   ON o_orderkey = l_orderkey
       WHERE p_name LIKE '%a%'
       GROUP BY n_name, o_year""",
)
def q09_product_profit(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q9 (product-type profit by nation and year; cost proxied by
    p_retailprice — no partsupp in the testdata schema). ONE large-large
    hash join (lineitem⋈orders for the year); the part filter, the part
    cost and the supplier→nation hop are dense broadcast arrays probed
    per batch, and each batch reduces to (nation, year) partials via one
    bincount over a composite index — the 6-way TPC-H join with exactly
    one shuffle."""
    part = _read_small(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])

    ppk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sel = pc.match_substring(part.column("p_name"), "a").to_numpy(zero_copy_only=False)
    part_ok = np.zeros(int(ppk.max()) + 2, dtype=bool)
    part_ok[ppk] = sel
    cost = np.zeros(int(ppk.max()) + 2, dtype=np.float64)
    cost[ppk] = part.column("p_retailprice").to_numpy(zero_copy_only=False)

    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    supp_nat = np.zeros(int(sk.max()) + 2, dtype=np.int64)
    supp_nat[sk] = supp.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nat_keys = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nat_names = np.asarray(nation.column("n_name").to_pylist(), dtype=object)[
        np.argsort(nat_keys)
    ]
    n_nations = len(nat_names)
    # the composite bincount index and the nat_names decode both assume
    # dense nation keys 0..n-1 — fail loudly on sparse keys (ADVICE r3;
    # q16/q20 convention)
    if int(nat_keys.max()) + 1 != n_nations or int(nat_keys.min()) != 0:
        raise ValueError(
            "q09 requires contiguous 0..n-1 nation keys; remap before packing"
        )
    ref = ray.put((part_ok, cost, supp_nat))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table, ref=ref) -> pa.Table:
        part_ok, cost, supp_nat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "o_year": pa.array([], pa.int64()),
                "profit": pa.array([], pa.float64()),
            }
        )
        if b.num_rows == 0:
            return empty
        k = np.clip(
            b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(part_ok) - 1,
        )
        m = part_ok[k]
        if not m.any():
            return empty
        b = b.filter(pa.array(m))
        k = k[m]
        s = np.clip(
            b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(supp_nat) - 1,
        )
        nat = supp_nat[s]
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        profit = price * (1.0 - disc) - cost[k] * qty
        year = pc.year(b.column("o_orderdate")).to_numpy(zero_copy_only=False).astype(np.int64)
        y0 = year.min()
        span = int(year.max()) - int(y0) + 1
        idx = (year - y0) * n_nations + nat
        sums = np.bincount(idx, weights=profit, minlength=span * n_nations)
        hit = np.nonzero(np.bincount(idx, minlength=span * n_nations))[0]
        return pa.table(
            {
                "nat": pa.array(hit % n_nations, pa.int64()),
                "o_year": pa.array(hit // n_nations + y0, pa.int64()),
                "profit": pa.array(sums[hit], pa.float64()),
            }
        )

    out = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby(["nat", "o_year"])
        .aggregate(Sum("profit", alias_name="profit"))
    )
    names_ref = ray.put(nat_names)

    def attach(b: pa.Table, ref=names_ref) -> pa.Table:
        names = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        nat = b.column("nat").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "nation": pa.array(list(names[nat]), pa.string()),
                "o_year": b.column("o_year"),
                "profit": pa.array(
                    _round_half_away(b.column("profit").to_numpy(zero_copy_only=False), 4),
                    pa.float64(),
                ),
            }
        )

    return out.map_batches(attach, batch_format="pyarrow")


@register(
    "q11_important_value",
    """WITH pv AS (SELECT l_partkey,
                          CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0)
                                        AS BIGINT)) AS BIGINT) AS value_e4
                   FROM lineitem GROUP BY l_partkey),
            s AS (SELECT count(*) AS cnt, sum(value_e4) AS total FROM pv)
       SELECT l_partkey, value_e4
       FROM pv
       WHERE value_e4 * 2 * (SELECT cnt FROM s) > 3 * (SELECT total FROM s)""",
)
def q11_important_value(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q11 shape (grouped value share vs a global scalar subquery;
    lineitem revenue stands in for partsupp stock value; the fixed
    TPC-H fraction is replaced by a scale-free "above 1.5x the average
    part value" cut so the survivor set is nonempty at every sf). The
    q22 exactness trick, pushed to the ROW level because revenue is a
    4-dp decimal: each row maps to integer 1e-4 units via the same
    IEEE double product both engines compute bit-identically, so every
    downstream sum and the threshold compare are exact int64 arithmetic
    with no float-summation order dependence. (int64 headroom: row
    values ~1e9, so the cnt-scaled compare stays exact up to ~1e9
    parts.) Per-batch int combiner → grouped Sum per partkey (PART-scale
    output, materialized ONCE so the scalar aggregate and the filter
    don't re-execute the lineitem scan — Ray re-runs lazy branches per
    consumer) → broadcast-scalar filter."""

    def pre(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        e4 = _round_half_away(price * (1.0 - disc) * 10000.0, 0).astype(np.int64)
        g = (
            pa.table(
                {
                    "l_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
                    "value_e4": pa.array(e4, pa.int64()),
                }
            )
            .group_by(["l_partkey"])
            .aggregate([("value_e4", "sum")])
        )
        return g.rename_columns(["l_partkey", "value_e4"])

    pv = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("value_e4", alias_name="value_e4"))
        .materialize()
    )
    total = int(pv.sum("value_e4"))
    cnt = int(pv.count())

    def keep(b: pa.Table, total=total, cnt=cnt) -> pa.Table:
        v = b.column("value_e4").to_numpy(zero_copy_only=False)
        out = b.filter(pa.array(v * 2 * cnt > 3 * total))
        return pa.table(
            {
                "l_partkey": pc.cast(out.column("l_partkey"), pa.int64()),
                "value_e4": pc.cast(out.column("value_e4"), pa.int64()),
            }
        )

    return pv.map_batches(keep, batch_format="pyarrow")


@register(
    "q16_supplier_part_count",
    """SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       FROM part JOIN lineitem ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#13'
         AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
       GROUP BY p_type, p_size""",
)
def q16_supplier_part_count(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q16 shape (distinct suppliers per part attribute, minus an
    excluded supplier set; lineitem stands in for partsupp). The brand
    filter, (type, size) attributes and the NOT-IN supplier set are
    broadcast lookups; each batch locally dedups composite
    (type_idx·64 + size) << 32 | suppkey keys, a grouped Count over the
    composite makes the dedup global, and a second tiny grouped Sum
    counts survivors per (p_type, p_size) — the fact table is never
    shuffled, only composite keys bounded by |parts|×|suppliers|."""
    part = _read_small(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    ppk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(set(part.column("p_type").to_pylist()))
    type_code = {t: i for i, t in enumerate(types)}
    brand_ok = np.zeros(int(ppk.max()) + 2, dtype=bool)
    brand_ok[ppk] = np.asarray(
        pc.not_equal(part.column("p_brand"), "Brand#13").to_numpy(zero_copy_only=False)
    )
    attr = np.full(int(ppk.max()) + 2, -1, dtype=np.int64)  # type_idx*64 + size
    attr[ppk] = np.array(
        [type_code[t] for t in part.column("p_type").to_pylist()], dtype=np.int64
    ) * 64 + part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)

    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    supp_ok = np.zeros(int(sk.max()) + 2, dtype=bool)
    supp_ok[sk] = supp.column("s_acctbal").to_numpy(zero_copy_only=False) >= 1000.0
    # composite-key headroom: attr = type_idx*64 + size needs size < 64
    # (TPC-H p_size ≤ 50 by spec) and suppkey < 2^32 — fail LOUDLY if a
    # future corpus breaks the packing instead of corrupting keys.
    if int(pc.max(part.column("p_size")).as_py()) >= 64:
        raise ValueError("p_size ≥ 64 breaks attr packing")
    if int(sk.max()) >= (1 << 32):
        raise ValueError("s_suppkey ≥ 2^32 breaks composite packing")
    ref = ray.put((brand_ok, attr, supp_ok))

    def pre(b: pa.Table, ref=ref) -> pa.Table:
        brand_ok, attr, supp_ok = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = np.clip(
            b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(brand_ok) - 1,
        )
        s = np.clip(
            b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(supp_ok) - 1,
        )
        m = brand_ok[k] & supp_ok[s]
        comp = np.unique((attr[k[m]] << 32) | s[m])
        return pa.table({"comp": pa.array(comp, pa.int64())})

    distinct = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("comp")
        .aggregate(Count(alias_name="_n"))
    )
    types_arr = np.asarray(types, dtype=object)
    types_ref = ray.put(types_arr)

    def decode(b: pa.Table, ref=types_ref) -> pa.Table:
        types_arr = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        comp = b.column("comp").to_numpy(zero_copy_only=False)
        a = comp >> 32
        g = (
            pa.table(
                {
                    "p_type": pa.array(list(types_arr[a // 64]), pa.string()),
                    "p_size": pa.array(a % 64, pa.int64()),
                    "one": pa.array(np.ones(len(comp), dtype=np.int64), pa.int64()),
                }
            )
            .group_by(["p_type", "p_size"])
            .aggregate([("one", "sum")])
        )
        return g.rename_columns(["p_type", "p_size", "n"])

    return (
        distinct.map_batches(decode, batch_format="pyarrow")
        .groupby(["p_type", "p_size"])
        .aggregate(Sum("n", alias_name="supplier_cnt"))
    )


@register(
    "q20_top_quantity_suppliers",
    """WITH psq AS (SELECT l_partkey, l_suppkey,
                           CAST(sum(l_quantity) AS BIGINT) AS qty
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_type = 'PROMO'
                    GROUP BY l_partkey, l_suppkey),
         pt AS (SELECT l_partkey AS pk, sum(qty) AS total,
                       count(*) AS ns
                FROM psq GROUP BY pk)
       SELECT DISTINCT s_suppkey, s_name
       FROM supplier
         JOIN psq ON s_suppkey = l_suppkey
         JOIN pt  ON psq.l_partkey = pt.pk
       WHERE qty * ns > 2 * total""",
)
def q20_top_quantity_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H Q20 shape (suppliers dominating a part's supply: the
    correlated available-quantity threshold becomes "more than twice
    the average supplier share of that part" — scale-free, so the
    survivor set stays nonempty at every sf, unlike a fixed 0.5 cut
    which empties as supplier counts grow). Per-batch (part, supp)
    quantity combiner over the type-filtered fact → grouped Sum on a
    composite key → ONE sharded pass per partkey % SHARDS computes each
    part's total + supplier count with reduceat over key runs and keeps
    dominating suppliers → global distinct suppkey → broadcast name
    attach. Quantities are integer-valued doubles, so the rint to int64
    and the qty·ns > 2·total compare are exact. Schema-pinned collect:
    the survivor set can be empty."""
    from ..stages.dedup import SHARDS

    part = _read_small(sf_dir, "part", ["p_partkey", "p_type"])
    ppk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    promo = np.zeros(int(ppk.max()) + 2, dtype=bool)
    promo[ppk] = np.asarray(
        pc.equal(part.column("p_type"), "PROMO").to_numpy(zero_copy_only=False)
    )
    # comp = pk << 22 | sk needs suppkeys < 2^22 (TPC-H: 10k·SF, safe to
    # SF≈420) and partkeys < 2^41 — fail loudly past the packing limit.
    supp_max = _read_small(sf_dir, "supplier", ["s_suppkey"])
    if int(pc.max(supp_max.column("s_suppkey")).as_py()) >= (1 << 22):
        raise ValueError(
            "s_suppkey ≥ 2^22 breaks the (part, supp) composite; widen the shift"
        )
    ref = ray.put(promo)

    def pre(b: pa.Table, ref=ref) -> pa.Table:
        promo = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = np.clip(
            b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64),
            0,
            len(promo) - 1,
        )
        m = promo[k]
        comp = (k[m] << 22) | b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[m]
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[m]
        order = np.argsort(comp, kind="stable")
        comp, qty = comp[order], qty[order]
        starts = np.nonzero(np.r_[True, comp[1:] != comp[:-1]])[0] if len(comp) else np.array([], np.int64)
        sums = np.add.reduceat(qty, starts) if len(comp) else np.array([], np.float64)
        return pa.table(
            {"comp": pa.array(comp[starts], pa.int64()), "qty": pa.array(sums, pa.float64())}
        )

    grouped = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("comp")
        .aggregate(Sum("qty", alias_name="qty"))
    )

    def add_shard(b: pa.Table) -> pa.Table:
        comp = b.column("comp").to_numpy(zero_copy_only=False)
        pk = comp >> 22
        return pa.table(
            {
                "shard": _key_shard(pa.array(pk, pa.int64()), SHARDS),
                "pk": pa.array(pk, pa.int64()),
                "sk": pa.array(comp & ((1 << 22) - 1), pa.int64()),
                "qty": b.column("qty"),
            }
        )

    def dominate_shard(group: pa.Table) -> pa.Table:
        pk = group.column("pk").combine_chunks().to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return pa.table({"sk": pa.array([], pa.int64())})
        sk = group.column("sk").combine_chunks().to_numpy(zero_copy_only=False)
        qty = np.rint(
            group.column("qty").combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, sk, qty = pk[order], sk[order], qty[order]
        starts = np.nonzero(np.r_[True, pk[1:] != pk[:-1]])[0]
        lens = np.diff(np.r_[starts, len(pk)])
        total = np.repeat(np.add.reduceat(qty, starts), lens)
        ns = np.repeat(lens.astype(np.int64), lens)
        keep = qty * ns > 2 * total
        return pa.table({"sk": pa.array(np.unique(sk[keep]), pa.int64())})

    winners = (
        grouped.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(dominate_shard, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Count(alias_name="_n"))
    )

    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_name"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    names = np.empty(int(sk.max()) + 2, dtype=object)
    names[sk] = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    names_ref = ray.put(names)

    def attach(b: pa.Table, ref=names_ref) -> pa.Table:
        names = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        k = b.column("sk").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(k, pa.int64()),
                "s_name": pa.array(list(names[np.clip(k, 0, len(names) - 1)]), pa.string()),
            }
        )

    ds = winners.map_batches(attach, batch_format="pyarrow")
    schema = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    return pa.concat_tables([t.cast(schema) for t in tables]) if tables else schema.empty_table()


# -------------- B54: theta-sketch set operations (union/intersect/diff)

@register("b54_kmv_set_ops", None)  # approximate → rows-only; tolerance
def b54_kmv_set_ops(sf_dir: str) -> pa.Table:  # tested vs exact in tests/
    """Distinct-cardinality SET OPERATIONS without materializing either
    set (theta-sketch framework over the KMV primitive): |A∪B|, |A∩B|
    and |A∖B| of the click vs purchase (user, day) activity sets. One
    pass over events emits BOTH per-batch KMV partials; the driver
    merges k u64s per set and clips to the shared theta — at 100 TB
    the exchange is a few KB per block, while an exact answer would
    shuffle two corpus-scale key sets. Exact below k distinct;
    ±1/sqrt(k-2) above (accuracy-tested vs exact in tests)."""
    from ..functions.sketch import kmv_merge, kmv_partial, kmv_set_estimates

    def partials(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        day = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"), pa.int64())
        key = pc.add(
            pc.multiply(pc.cast(b.column("user_id"), pa.int64()), pa.scalar(1 << 20, pa.int64())),
            pc.divide(day, pa.scalar(86_400_000_000, pa.int64())),
        )
        out = {}
        for name, typ in (("a", "click"), ("b", "purchase")):
            keys = pc.filter(key, pc.equal(et, typ))
            sk = kmv_partial(keys)
            out[name] = pa.array([sk.view(np.int64).tolist()], pa.list_(pa.int64()))
        return pa.table(out)

    def kmv_pair_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: union of k-minimum sets IS kmv_merge (both
        sketches merged in lockstep)."""
        out = {}
        for c in ("a", "b"):
            sk = kmv_merge(
                [np.asarray(x, dtype=np.int64).view(np.uint64) for x in b.column(c).to_pylist()]
            )
            out[c] = pa.array([sk.view(np.int64).tolist()], pa.list_(pa.int64()))
        return pa.table(out)

    parts = _tree_fold(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        ),
        kmv_pair_merge,
    )
    sa = kmv_merge([np.asarray(p["a"], dtype=np.int64).view(np.uint64) for p in parts])
    sb = kmv_merge([np.asarray(p["b"], dtype=np.int64).view(np.uint64) for p in parts])
    est = kmv_set_estimates(sa, sb)
    return pa.table(
        {
            "n_union": pa.array([int(round(est["union"]))], pa.int64()),
            "n_intersection": pa.array([int(round(est["intersection"]))], pa.int64()),
            "n_click_only": pa.array([int(round(est["a_not_b"]))], pa.int64()),
        }
    )


# -------- B21d: weighted k-per-group sample (Efraimidis-Spirakis A-ExpJ)

def weighted_group_sample(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int = 10,
    seed: int = 42,
) -> ray.data.Dataset:
    """k-per-group sample WITHOUT REPLACEMENT with inclusion probability
    proportional to weight (Efraimidis & Spirakis 2006): each row draws
    a deterministic uniform u from splitmix64(key, seed) and gets the
    exponential key e = -ln(u)/w; the k SMALLEST e per group are exactly
    a weighted sample without replacement. Same mergeable-order-statistic
    shape as the uniform bottom-k (b21c): each batch contributes a ≤ k
    rows/group partial, the per-group reduce touches ≤ k × blocks rows.
    Deterministic (re-runs and resumes pick identical rows); rows with
    weight ≤ 0 or null draw e = +inf and are never sampled."""
    from ..functions.hashing import mix64

    def exp_keys(b: pa.Table) -> np.ndarray:
        kv = b.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        w = b.column(weight_col).combine_chunks().to_numpy(zero_copy_only=False)
        w = np.where(np.isfinite(w.astype(np.float64)), w, 0.0).astype(np.float64)
        u = (mix64(kv.astype(np.int64), seed=seed).astype(np.float64) + 0.5) / 2.0**64
        with np.errstate(divide="ignore"):
            return np.where(w > 0.0, -np.log(u) / np.maximum(w, 1e-300), np.inf)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_e", pa.array([], pa.float64()))
        e = exp_keys(b)
        kv = b.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        grp = b.column(group_col).combine_chunks()
        codes = pc.index_in(grp, value_set=grp.unique()).to_numpy(zero_copy_only=False)
        order = np.lexsort((kv, e, codes))
        codes_s = codes[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        keep = np.concatenate([order[s:min(s + k, e_)] for s, e_ in zip(starts, ends)])
        t = b.append_column("_e", pa.array(e, pa.float64()))
        return t.take(pa.array(np.sort(keep)))

    def final(g: pa.Table) -> pa.Table:
        e = g.column("_e").combine_chunks().to_numpy(zero_copy_only=False)
        kv = g.column(key_col).combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((kv, e))[:k]
        keep = keep[np.isfinite(e[keep])]
        return g.drop_columns(["_e"]).take(pa.array(np.sort(keep)))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


@register(
    "b21d_weighted_sample",
    # exact replica of the Efraimidis-Spirakis draw: the FULL splitmix64
    # finalizer (seed 42) in UHUGEINT-mod-2^64 multiplies / UBIGINT
    # xor-shifts (verified bit-identical to functions/hashing.mix64),
    # u = (h + 0.5)/2^64 mirrored operand-for-operand, then the 10
    # smallest exponential keys -ln(u)/w per group with the engine's
    # (e, key) tie-break. ln() last-ulp divergence between numpy and
    # DuckDB cannot flip the SELECTION unless two keys' e values are
    # within ~1 ulp — verified exact at sf0.001/0.01/0.1.
    """WITH s1 AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
            CAST((CAST(o_orderkey AS UHUGEINT) + CAST(42 AS UHUGEINT)
                  + CAST(11400714819323198485 AS UHUGEINT))
                 % CAST(18446744073709551616 AS UHUGEINT) AS UBIGINT) AS z0
            FROM orders),
     s2 AS (SELECT *, CAST((CAST(xor(z0, z0 >> 30) AS UHUGEINT)
                            * CAST(13787848793156543929 AS UHUGEINT))
                           % CAST(18446744073709551616 AS UHUGEINT) AS UBIGINT) AS z1
            FROM s1),
     s3 AS (SELECT *, CAST((CAST(xor(z1, z1 >> 27) AS UHUGEINT)
                            * CAST(10723151780598845931 AS UHUGEINT))
                           % CAST(18446744073709551616 AS UHUGEINT) AS UBIGINT) AS z2
            FROM s2),
     s4 AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
            (CAST(xor(z2, z2 >> 31) AS DOUBLE) + 0.5)
              / 18446744073709551616.0 AS u
            FROM s3)
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM s4 WHERE o_totalprice > 0
    QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                               ORDER BY -ln(u)/o_totalprice, o_orderkey) <= 10""",
)
def b21d_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """10 orders per o_orderstatus sampled ∝ o_totalprice — the
    weighted member of the sampling family (uniform b21, stratified
    b21b, bottom-k b21c); weight-bias, determinism and k-per-group are
    tested in tests/test_invariants.py, and the selection is
    integer/float-exact against a DuckDB splitmix64 replica."""
    return weighted_group_sample(
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderkey", "o_totalprice"]),
        group_col="o_orderstatus",
        key_col="o_orderkey",
        weight_col="o_totalprice",
        k=10,
    )


# --------------------------------- B55: CUBE grouping sets

@register(
    "b55_cube",
    """SELECT CAST(GROUPING(source, lang) AS BIGINT) AS grouping_id,
              source, lang, count(*) AS n_docs
       FROM documents GROUP BY CUBE (source, lang)""",
)
def b55_cube(sf_dir: str) -> pa.Table:
    """CUBE (source, lang) over documents with a GROUPING() id — the
    full grouping-sets lattice next to b16d's ROLLUP. Same plan shape:
    ONE distributed leaf aggregate (per-batch combiner, then a grouped
    Sum over the tiny (source, lang) key space), then every coarser
    set — (source), (lang), () — derives driver-side from the leaf
    without rescanning the table. grouping_id follows the SQL GROUPING
    bit convention: bit 0 = lang aggregated out, bit 1 = source
    aggregated out (so leaf=0, (source)=1, (lang)=2, ()=3).

    Scale: the only shuffle is over |sources|×|langs| keys; the lattice
    expansion touches leaf rows only, never the corpus."""

    def pre(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "lang", "n_docs"])

    leaf = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )
    src = [r["source"] for r in leaf]
    lang = [r["lang"] for r in leaf]
    n = [r["n_docs"] for r in leaf]
    by_src: dict[str, int] = {}
    by_lang: dict[str, int] = {}
    for s, l, c in zip(src, lang, n):
        by_src[s] = by_src.get(s, 0) + c
        by_lang[l] = by_lang.get(l, 0) + c
    srcs = sorted(by_src)
    langs = sorted(by_lang)
    return pa.table(
        {
            "grouping_id": pa.array(
                [0] * len(n) + [1] * len(srcs) + [2] * len(langs) + [3], pa.int64()
            ),
            "source": pa.array(src + srcs + [None] * len(langs) + [None], pa.string()),
            "lang": pa.array(lang + [None] * len(srcs) + langs + [None], pa.string()),
            "n_docs": pa.array(
                n + [by_src[s] for s in srcs] + [by_lang[l] for l in langs] + [sum(n)],
                pa.int64(),
            ),
        }
    )


# --------------------------------- ts: linear interpolation on the grid

@register(
    "ts_interpolate",
    """WITH ev AS (
         SELECT user_id, value,
                date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec,
                row_number() OVER (w) AS i,
                lead(date_diff('second', TIMESTAMP '1970-01-01', ts)) OVER (w) AS nsec,
                lead(value) OVER (w) AS nval
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       evd AS (
         SELECT user_id, sec, value,
                COALESCE(nsec, sec) AS rt, COALESCE(nval, value) AS rv
         FROM (SELECT *, row_number() OVER (
                   PARTITION BY user_id, sec ORDER BY i DESC) AS rn
               FROM ev) WHERE rn = 1),
       b AS (SELECT user_id, min(sec) // 3600 AS lo_h, max(sec) // 3600 AS hi_h
             FROM ev GROUP BY user_id),
       grid AS (SELECT user_id, unnest(generate_series(lo_h, hi_h)) AS h FROM b),
       probe AS (SELECT user_id, h, h * 3600 + 3599 AS g_sec FROM grid),
       j AS (
         SELECT p.user_id, p.h, p.g_sec,
                e.sec AS lt, e.value AS lv, e.rt, e.rv,
                CAST(e.rt - e.sec AS DOUBLE) AS span
         FROM probe p ASOF JOIN evd e
           ON p.user_id = e.user_id AND e.sec <= p.g_sec)
       SELECT user_id,
              make_timestamp(h * 3600 * 1000000) AS bucket,
              lv + (rv - lv) * LEAST(GREATEST(
                  CASE WHEN span > 0
                       THEN CAST(g_sec - lt AS DOUBLE) / GREATEST(span, 1.0)
                       ELSE 0.0 END, 0.0), 1.0) AS value
       FROM j""",
)
def ts_interpolate(sf_dir: str) -> ray.data.Dataset:
    """Per-user HOURLY grid with LINEAR time interpolation: each grid
    point between two observations takes the time-weighted blend of the
    latest event at-or-before it and the earliest event after it; past
    the last event it holds the last value (ffill tail). Completes the
    resampling family next to ts_resample_ffill (step-function fill).

    Same scale shape as ts_resample_ffill: one sharded shuffle on
    user_id % SHARDS, then a fully vectorized pass per shard — ragged
    grids via repeat/cumsum arange, ONE searchsorted over the composite
    (user_id << 34 | epoch_seconds) key for the left neighbor, and the
    right neighbor is just left+1 clamped to the user's run — no
    per-user Python call. Composite key needs user_id < 2^29 and
    epoch < 2^34 s, asserted."""
    from ..stages.dedup import SHARDS

    HOUR = np.int64(3600)

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def interp_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
            }
        )
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return empty
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts_s = ts // 1_000_000
        if not (
            (uid >= 0).all()
            and (uid < (1 << 29)).all()
            and (ts_s >= 0).all()
            and (ts_s < (1 << 34)).all()
        ):
            # load-bearing for the composite (uid << 34 | ts_s) key below;
            # raise (not assert) so `python -O` cannot silently mis-pack
            # (negative uids would wrap the int64 shift positive and
            # break the searchsorted ordering silently)
            raise ValueError("user_id must be in [0, 2^29) and ts within [1970, ~2514)")
        # event_id tie-break keeps equal-(user, ts) neighbor choice
        # deterministic regardless of shuffle delivery order.
        order = np.lexsort((eid, ts, uid))
        uid, ts_s, val = uid[order], ts_s[order], val[order]
        key = (uid << 34) | ts_s
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        ends = np.r_[starts[1:], n]
        lo_h = ts_s[starts] // HOUR
        hi_h = ts_s[ends - 1] // HOUR
        lens = (hi_h - lo_h + 1).astype(np.int64)
        total = int(lens.sum())
        off = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        g_uid = np.repeat(uid[starts], lens)
        g_sec = (np.repeat(lo_h, lens) + off) * HOUR + (HOUR - 1)
        g_key = (g_uid << 34) | g_sec
        left = np.searchsorted(key, g_key, side="right") - 1
        run_start = np.repeat(starts, lens)
        run_end = np.repeat(ends, lens)
        left = np.maximum(left, run_start)  # first hour always has an event
        right = np.minimum(left + 1, run_end - 1)
        lt, rt = ts_s[left], ts_s[right]
        lv, rv = val[left], val[right]
        span = (rt - lt).astype(np.float64)
        # right == left past the last event (ffill tail) → span 0 → lv.
        frac = np.where(span > 0, (g_sec - lt).astype(np.float64) / np.maximum(span, 1.0), 0.0)
        v = lv + (rv - lv) * np.clip(frac, 0.0, 1.0)
        return pa.table(
            {
                "user_id": pa.array(g_uid, pa.int64()),
                "bucket": pa.array(
                    ((np.repeat(lo_h, lens) + off) * HOUR * 1_000_000).astype(
                        "datetime64[us]"
                    ),
                    pa.timestamp("us"),
                ),
                "value": pa.array(v, pa.float64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(interp_shard, batch_format="pyarrow")
    )


@register(
    "b56_corr_matrix",
    """SELECT 'l_quantity' AS col_x, 'l_quantity' AS col_y, ROUND(corr(l_quantity, l_quantity), 6) AS corr FROM lineitem
       UNION ALL SELECT 'l_quantity', 'l_extendedprice', ROUND(corr(l_quantity, l_extendedprice), 6) FROM lineitem
       UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(corr(l_quantity, l_discount), 6) FROM lineitem
       UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(corr(l_quantity, l_tax), 6) FROM lineitem
       UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', ROUND(corr(l_extendedprice, l_extendedprice), 6) FROM lineitem
       UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
       UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(corr(l_extendedprice, l_tax), 6) FROM lineitem
       UNION ALL SELECT 'l_discount', 'l_discount', ROUND(corr(l_discount, l_discount), 6) FROM lineitem
       UNION ALL SELECT 'l_discount', 'l_tax', ROUND(corr(l_discount, l_tax), 6) FROM lineitem
       UNION ALL SELECT 'l_tax', 'l_tax', ROUND(corr(l_tax, l_tax), 6) FROM lineitem""",
)
def b56_corr_matrix(sf_dir: str) -> pa.Table:
    """Pearson correlation matrix of lineitem's four numeric measures in
    ONE streaming pass — the mergeable-co-moment pattern: each batch
    emits (n, Σx_i, Σx_i·x_j) partials (15 float64s per batch, constant
    wire cost at any scale), the driver folds them with math.fsum
    (correctly-rounded exact summation, so the fold order cannot change
    the result) and assembles the matrix. Long form (col_x, col_y,
    corr) over the upper triangle, rounded to 6 decimals (per-batch
    inner products are batch-shape-dependent in the last ulps — the
    same reason every float aggregate here rounds).
    tests/test_corr_zscore.py checks DuckDB corr() equality to 1e-9."""
    import math

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(i, j) for i in range(len(cols)) for j in range(i, len(cols))]

    def partial(b: pa.Table) -> pa.Table:
        xs = [
            b.column(c).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ]
        out = {"n": pa.array([b.num_rows], pa.int64())}
        for i, c in enumerate(cols):
            out[f"s{i}"] = pa.array([float(xs[i].sum())], pa.float64())
        for i, j in pairs:
            out[f"p{i}_{j}"] = pa.array([float(np.dot(xs[i], xs[j]))], pa.float64())
        return pa.table(out)

    rows = (
        _read(sf_dir, "lineitem", cols)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )

    def fsum_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: exactly-rounded fsum per column (n stays
        int64) — same accumulator the driver's final fold uses."""
        out = {}
        for c in b.column_names:
            v = b.column(c).to_pylist()
            if c == "n":
                out[c] = pa.array([int(sum(v))], pa.int64())
            else:
                out[c] = pa.array([math.fsum(v)], pa.float64())
        return pa.table(out)

    rows = _tree_fold(rows, fsum_merge)
    n = sum(r["n"] for r in rows)
    s = [math.fsum(r[f"s{i}"] for r in rows) for i in range(len(cols))]
    p = {(i, j): math.fsum(r[f"p{i}_{j}"] for r in rows) for i, j in pairs}
    cx, cy, cc = [], [], []
    for i, j in pairs:
        cov = p[(i, j)] / n - (s[i] / n) * (s[j] / n)
        vi = p[(i, i)] / n - (s[i] / n) ** 2
        vj = p[(j, j)] / n - (s[j] / n) ** 2
        denom = math.sqrt(vi * vj)
        cx.append(cols[i])
        cy.append(cols[j])
        cc.append(
            float(_round_half_away(np.array([cov / denom]), 6)[0]) if denom > 0 else None
        )
    return pa.table(
        {
            "col_x": pa.array(cx, pa.string()),
            "col_y": pa.array(cy, pa.string()),
            "corr": pa.array(cc, pa.float64()),
        }
    )


@register(
    "data_group_normalize",
    """SELECT event_id, event_type,
              ROUND(CASE WHEN sd > 0 THEN (value - mean) / sd ELSE 0.0 END, 6) AS z
       FROM (SELECT event_id, event_type, value,
                    avg(value) OVER (PARTITION BY event_type) AS mean,
                    stddev_pop(value) OVER (PARTITION BY event_type) AS sd
             FROM events)""",
)
def data_group_normalize(sf_dir: str) -> ray.data.Dataset:
    """Per-group z-score normalization — events.value standardized
    within its event_type: the feature-scaling step of a training-data
    pipeline. Two passes, both scale-shaped: (1) per-batch (group, n,
    Σv, Σv²) combiner partials → one TINY grouped fold (|event_types|
    rows) → broadcast dict; (2) one map_batches applies
    (v − mean) / σ_pop vectorized. σ = 0 groups normalize to 0. Sorted
    by event_id; z rounded to 6 decimals (distributed float partials).
    tests/test_corr_zscore.py checks DuckDB equality to 1e-6."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table(
            {
                "g": b.column("event_type"),
                "n": pa.array(np.ones(len(v), np.int64), pa.int64()),
                "s": pa.array(v, pa.float64()),
                "q": pa.array(v * v, pa.float64()),
            }
        )
        g = t.group_by(["g"]).aggregate([("n", "sum"), ("s", "sum"), ("q", "sum")])
        return g.rename_columns(["g", "n", "s", "q"])

    def merge_grouped(b: pa.Table) -> pa.Table:
        """tree_fold merge: re-group the per-block (g, n, s, q) partial
        rows; output rows = |event types| (small, bounded by the
        rows_per_merge declaration below)."""
        g = b.group_by(["g"]).aggregate([("n", "sum"), ("s", "sum"), ("q", "sum")])
        return g.rename_columns(["g", "n", "s", "q"])

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"]).materialize()
    parts = _tree_fold(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge_grouped,
        rows_per_merge=64,
    )
    acc: dict[str, list] = {}
    for r in parts:
        a = acc.setdefault(r["g"], [0, [], []])
        a[0] += r["n"]
        a[1].append(r["s"])
        a[2].append(r["q"])
    stats = {}
    for g, (n, ss, qq) in acc.items():
        mean = math.fsum(ss) / n
        var = max(math.fsum(qq) / n - mean * mean, 0.0)
        stats[g] = (mean, math.sqrt(var))
    stats_ref = ray.put(stats)

    def normalize(b: pa.Table, _ref=stats_ref) -> pa.Table:
        st = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        gs = b.column("event_type").combine_chunks()
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        keys = pa.array(sorted(st), pa.string())
        pos = pc.index_in(gs, value_set=keys).to_numpy(zero_copy_only=False)
        means = np.array([st[k.as_py()][0] for k in keys], np.float64)
        sds = np.array([st[k.as_py()][1] for k in keys], np.float64)
        m, sd = means[pos], sds[pos]
        z = np.where(sd > 0, (v - m) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": gs,
                "z": pa.array(_round_half_away(z, 6), pa.float64()),
            }
        )

    return ev.map_batches(normalize, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    )


@register(
    "ts_ewma",
    # NB: the recurrence literal is spelled (1.0 - 0.3), not 0.7 — they
    # are DIFFERENT doubles, and the engine's step-wise regime performs
    # exactly these ops (see _affine_scan).
    """WITH RECURSIVE o AS (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
         FROM events),
       r AS (
         SELECT user_id, event_id, i, CAST(value AS DOUBLE) AS z
         FROM o WHERE i = 1
         UNION ALL
         SELECT o.user_id, o.event_id, o.i, (1.0 - 0.3) * r.z + 0.3 * o.value
         FROM o JOIN r ON o.user_id = r.user_id AND o.i = r.i + 1)
       SELECT event_id, user_id, ROUND(z, 6) AS ewma FROM r""",
)
def ts_ewma(sf_dir: str, alpha: float = 0.3) -> ray.data.Dataset:
    """Per-user exponentially weighted moving average of events.value in
    time order (z_t = α·v_t + (1−α)·z_{t−1}, z_0 = v_0 — pandas
    ewm(adjust=False) semantics): the streaming-smoother member of the
    time-series family next to resample/interpolate.

    One sharded shuffle, then a FULLY vectorized pass per shard with NO
    per-user Python: the recurrence is an affine map z_t = A_t·z_{t−1}
    + B_t (A = 1−α, except A = 0 at each user's first event, which
    resets the scan), composed with an O(log n) doubling scan — each
    pass one numpy multiply-add over the whole shard. A = 0 at run
    starts blocks propagation across users, so no boundary masking is
    needed; A products underflow to 0 harmlessly. Exactness note: the
    doubling composition is algebraically identical to the sequential
    recurrence but associates float ops differently — equal to pandas
    to ~1e-12 relative, so the output rounds to 6 decimals (at 8, a
    handful of sf0.01 rows sit within an ulp of the rounding boundary
    vs the sequential-recurrence oracle; 6 clears it with margin)."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def ewma_shard(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ewma": pa.array([], pa.float64()),
                }
            )
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        # event_id breaks exact-(user, ts) ties deterministically
        order = np.lexsort((eid, ts, uid))
        uid_s, val_s, eid_s = uid[order], val[order].astype(np.float64), eid[order]
        is_start = np.r_[True, uid_s[1:] != uid_s[:-1]]
        A = np.where(is_start, 0.0, 1.0 - alpha)
        B = np.where(is_start, val_s, alpha * val_s)
        B = _affine_scan(A, B, seg_starts=np.flatnonzero(is_start))
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "ewma": pa.array(_round_half_away(B, 6), pa.float64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(ewma_shard, batch_format="pyarrow")
        .sort("event_id")
    )


@register("data_quantile_transform", None)  # sketch-approximate → rows-only; tolerance tested
def data_quantile_transform(sf_dir: str) -> ray.data.Dataset:
    """Quantile (rank/CDF) transform of events.value — the
    skew-robust feature-scaling alternative to z-scores: each value
    maps to its approximate global CDF rank in [0, 1]. Two passes,
    both scale-shaped: (1) the mergeable compressed-CDF sketch
    (functions/sketch, ≤256 weighted points per block on the wire)
    merges driver-side; (2) the tiny sketch broadcasts and one
    vectorized np.interp per batch assigns ranks. Rank error is the
    sketch's (≈1%, tolerance-tested vs the exact empirical CDF);
    ranks are monotone in the value by construction. Rounded to 6
    decimals, sorted by event_id."""
    from ..functions.sketch import quantile_merge, quantile_partial, quantile_rank

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        pts = quantile_partial(np.asarray(v, dtype=np.float64))
        return pa.table(
            {"pts": pa.array([pts.reshape(-1).tolist()], pa.list_(pa.float64()))}
        )

    ev = _read(sf_dir, "events", ["event_id", "value"]).materialize()
    def _pts_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: quantile_merge is the sketch's mergeable op."""
        if b.num_rows == 0:
            return pa.table({"pts": pa.array([], pa.list_(pa.float64()))})
        sk = quantile_merge(
            [np.asarray(x, dtype=np.float64).reshape(-1, 2) for x in b.column("pts").to_pylist()]
        )
        return pa.table({"pts": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.float64()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), _pts_merge
    )
    sketch = quantile_merge(
        [np.asarray(p["pts"], dtype=np.float64).reshape(-1, 2) for p in parts]
    )
    sketch_ref = ray.put(sketch)

    def transform(b: pa.Table, _ref=sketch_ref) -> pa.Table:
        sk = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        q = quantile_rank(sk, v)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "q": pa.array(_round_half_away(q, 6), pa.float64()),
            }
        )

    return ev.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    )


@register(
    "b57_histogram",
    """WITH mm AS (
         SELECT min(value) AS lo,
                CASE WHEN max(value) <= min(value) THEN min(value) + 1
                     ELSE max(value) END AS hi
         FROM events),
       bins AS (SELECT unnest(generate_series(0, 19)) AS bin_id),
       assign AS (
         SELECT LEAST(CAST(FLOOR((value - mm.lo) / (mm.hi - mm.lo) * 20)
                           AS BIGINT), 19) AS bin_id
         FROM events, mm),
       counts AS (SELECT bin_id, count(*) AS n FROM assign GROUP BY bin_id)
       SELECT CAST(b.bin_id AS BIGINT) AS bin_id,
              ROUND(mm.lo + b.bin_id * ((mm.hi - mm.lo) / 20), 8) AS lo,
              CASE WHEN b.bin_id = 19 THEN ROUND(mm.hi, 8)
                   ELSE ROUND(mm.lo + (b.bin_id + 1) * ((mm.hi - mm.lo) / 20), 8)
              END AS hi,
              COALESCE(c.n, 0) AS n
       FROM bins b CROSS JOIN mm LEFT JOIN counts c ON b.bin_id = c.bin_id""",
)
def b57_histogram(sf_dir: str, bins: int = 20) -> pa.Table:
    """Equi-width histogram of events.value — the profiling primitive:
    one global min/max aggregate fixes the bin edges, then each batch
    emits a ``bins``-long integer count partial (np.histogram — constant
    wire cost per batch) folded exactly on the driver. Counts are exact
    integers, so the result is partition-invariant bit-for-bit (unlike
    any float aggregate). Rows: (bin_id, lo, hi, n); numpy half-open
    bins, right edge closed on the last bin.
    tests/test_histogram_ngrams.py checks exact equality vs a one-shot
    np.histogram over the whole column."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["value"]).materialize()
    mm = ds.aggregate(Min("value", alias_name="lo"), Max("value", alias_name="hi"))
    lo, hi = float(mm["lo"]), float(mm["hi"])
    if hi <= lo:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, bins + 1)

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        n, _ = np.histogram(v, bins=edges)
        return pa.table({"n": pa.array([n.tolist()], pa.list_(pa.int64()))})

    def vec_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: elementwise int64 sum of the bin vectors."""
        m = np.zeros(bins, dtype=np.int64)
        for row in b.column("n").to_pylist():
            m += np.asarray(row, dtype=np.int64)
        return pa.table({"n": pa.array([m.tolist()], pa.list_(pa.int64()))})

    counts = np.zeros(bins, dtype=np.int64)
    for p in _tree_fold(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), vec_merge
    ):
        counts += np.asarray(p["n"], dtype=np.int64)
    return pa.table(
        {
            "bin_id": pa.array(np.arange(bins, dtype=np.int64), pa.int64()),
            "lo": pa.array(_round_half_away(edges[:-1], 8), pa.float64()),
            "hi": pa.array(_round_half_away(edges[1:], 8), pa.float64()),
            "n": pa.array(counts, pa.int64()),
        }
    )


def plan_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    broadcast_bytes: int = 64 * 1024 * 1024,
) -> dict:
    """Sketch-driven join planning — the broadcast-vs-shuffle decision
    this library otherwise makes by hand (b11 vs b12): ONE cheap
    profiling pass per side emits (rows, bytes, KMV key sketch)
    partials; the plan follows from driver-tiny folds. Returns
    {strategy, broadcast_side, left_rows, right_rows, left_distinct,
    right_distinct, est_output_rows}, where est_output_rows is the
    textbook containment estimate |L|·|R| / max(d_L, d_R).

    Why it scales: the profile pass is a streaming map_batches whose
    partials are a few hundred bytes per block (exact int rows/bytes +
    a k-minimum-values sketch), so planning a petabyte join costs one
    column scan — and a wrong AUTO choice (broadcasting a side that
    does not fit) is prevented by sizing on measured bytes, not row
    counts."""
    from ..functions.sketch import kmv_estimate, kmv_merge, kmv_partial

    def profile(ds: "ray.data.Dataset", key: str) -> tuple[int, int, float]:
        def partial(b: pa.Table) -> pa.Table:
            col = b.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sk = kmv_partial(col)
            return pa.table(
                {
                    "rows": pa.array([b.num_rows], pa.int64()),
                    "bytes": pa.array([b.nbytes], pa.int64()),
                    "sk": pa.array([sk.tolist()], pa.list_(pa.uint64())),
                }
            )

        def merge(b: pa.Table) -> pa.Table:
            """tree_fold merge: exact int sums + kmv_merge."""
            if b.num_rows == 0:
                return pa.table(
                    {
                        "rows": pa.array([], pa.int64()),
                        "bytes": pa.array([], pa.int64()),
                        "sk": pa.array([], pa.list_(pa.uint64())),
                    }
                )
            sk = kmv_merge([np.asarray(x, dtype=np.uint64) for x in b.column("sk").to_pylist()])
            return pa.table(
                {
                    "rows": pa.array([int(pc.sum(b.column("rows")).as_py() or 0)], pa.int64()),
                    "bytes": pa.array([int(pc.sum(b.column("bytes")).as_py() or 0)], pa.int64()),
                    "sk": pa.array([sk.tolist()], pa.list_(pa.uint64())),
                }
            )

        from ..functions.fold import tree_fold

        parts = tree_fold(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), merge
        )
        rows = sum(p["rows"] for p in parts)
        nbytes = sum(p["bytes"] for p in parts)
        sketch = kmv_merge([np.asarray(p["sk"], dtype=np.uint64) for p in parts])
        return rows, nbytes, kmv_estimate(sketch)

    l_rows, l_bytes, l_d = profile(left, left_key)
    r_rows, r_bytes, r_d = profile(right, right_key)
    est_out = int(l_rows * r_rows / max(l_d, r_d, 1.0))
    small_side = "left" if l_bytes <= r_bytes else "right"
    small_bytes = min(l_bytes, r_bytes)
    if small_bytes <= broadcast_bytes:
        strategy, bside = "broadcast", small_side
    else:
        strategy, bside = "shuffle", None
    return {
        "strategy": strategy,
        "broadcast_side": bside,
        "left_rows": int(l_rows),
        "right_rows": int(r_rows),
        "left_bytes": int(l_bytes),
        "right_bytes": int(r_bytes),
        "left_distinct": int(round(l_d)),
        "right_distinct": int(round(r_d)),
        "est_output_rows": est_out,
    }


@register("b58_join_planner", None)  # planning metadata → rows-only; estimate-accuracy tested
def b58_join_planner(sf_dir: str) -> pa.Table:
    """The planner applied to two characteristic joins: orders⋈customer
    (dimension side fits — broadcast) and lineitem⋈orders (both sides
    fact-scale at 100 TB — shuffle; the 64 MB wall is scaled down to
    the test corpus so the decision boundary is actually exercised).
    One row per join with the decision and the containment estimate;
    tests assert the estimates are within 2× of the true join
    cardinalities and the decisions match the known shapes."""
    oc = plan_join(
        _read(sf_dir, "orders", ["o_custkey"]),
        _read(sf_dir, "customer", ["c_custkey"]),
        "o_custkey",
        "c_custkey",
    )
    # scaled-down wall: customer/orders both fit in 64 MB at sf≤0.1, so
    # exercise the shuffle branch with a wall below the fact-table size
    lo = plan_join(
        _read(sf_dir, "lineitem", ["l_orderkey"]),
        _read(sf_dir, "orders", ["o_orderkey"]),
        "l_orderkey",
        "o_orderkey",
        broadcast_bytes=4 * 1024,
    )
    rows = [("orders_customer", oc), ("lineitem_orders", lo)]
    return pa.table(
        {
            "join": pa.array([n for n, _ in rows], pa.string()),
            "strategy": pa.array([p["strategy"] for _, p in rows], pa.string()),
            "broadcast_side": pa.array(
                [p["broadcast_side"] or "" for _, p in rows], pa.string()
            ),
            "left_rows": pa.array([p["left_rows"] for _, p in rows], pa.int64()),
            "right_rows": pa.array([p["right_rows"] for _, p in rows], pa.int64()),
            "left_distinct": pa.array([p["left_distinct"] for _, p in rows], pa.int64()),
            "right_distinct": pa.array([p["right_distinct"] for _, p in rows], pa.int64()),
            "est_output_rows": pa.array([p["est_output_rows"] for _, p in rows], pa.int64()),
        }
    )


@register(
    "b59_cdc_apply",
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
       changes AS (
           SELECT doc_id, text || ' [rev2]' AS text, 0 AS op
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, NULL, 1
           FROM documents WHERE doc_id % 11 = 0 AND doc_id % 3 <> 0
       )
       SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
              COALESCE(c.text, b.text) AS text
       FROM base b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
       WHERE COALESCE(c.op, 0) = 0""",
)
def b59_cdc_apply(sf_dir: str) -> ray.data.Dataset:
    """MERGE INTO semantics — apply a change set (upserts + deletes) to
    a snapshot: the other half of CDC next to b37's diff. Derived
    deterministically from `documents` so a SQL reference can build the
    identical inputs: base = doc_id % 7 != 0; upsert doc_id % 3 == 0
    with text + ' [rev2]' (an UPDATE when the key exists in base, an
    INSERT when not); delete doc_id % 11 == 0 (excluding the upsert set
    so each key carries one op).

    Scale shape: one co-shuffle on doc_id % SHARDS with base rows at
    priority 0 and change rows at priority 1, resolved VECTORIZED per
    shard (last-write-wins per key run, then the delete mask) — one
    Python call per shard. The payload moves through the shuffle ONCE,
    which is the floor for rewriting a snapshot; the resolution itself
    adds no second pass. Returns (doc_id, text) sorted by doc_id."""
    from ..stages.dedup import SHARDS

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tagged(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        text = b.column("text").combine_chunks()
        amended = pc.binary_join_element_wise(text, pa.scalar(" [rev2]"), "")
        in_base = did % 7 != 0
        is_up = did % 3 == 0
        is_del = (did % 11 == 0) & ~is_up
        base_idx = np.flatnonzero(in_base)
        chg_idx = np.flatnonzero(is_up | is_del)
        ids = np.r_[did[base_idx], did[chg_idx]]
        prio = np.r_[
            np.zeros(len(base_idx), np.int8), np.ones(len(chg_idx), np.int8)
        ]
        # delete rows carry op=1; upserts op=0
        op = np.r_[
            np.zeros(len(base_idx), np.int8), is_del[chg_idx].astype(np.int8)
        ]
        if isinstance(amended, pa.ChunkedArray):
            amended = amended.combine_chunks()
        txt = pa.concat_arrays(
            [text.take(pa.array(base_idx)), amended.take(pa.array(chg_idx))]
        )
        return pa.table(
            {
                "shard": pa.array((ids % SHARDS).astype(np.int32), pa.int32()),
                "doc_id": pa.array(ids, pa.int64()),
                "prio": pa.array(prio, pa.int8()),
                "op": pa.array(op, pa.int8()),
                "text": txt,
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        n = group.num_rows
        if n == 0:
            return empty
        did = group.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        prio = group.column("prio").combine_chunks().to_numpy(zero_copy_only=False)
        op = group.column("op").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((prio, did))
        did_s, op_s = did[order], op[order]
        # last row of each key run = the winning version (change > base)
        last = np.r_[did_s[1:] != did_s[:-1], True]
        win = np.flatnonzero(last)
        keep = win[op_s[win] == 0]  # deletes drop the key entirely
        idx = pa.array(np.asarray(order)[keep])
        text = group.column("text").combine_chunks().take(idx)
        return pa.table(
            {"doc_id": pa.array(did_s[keep], pa.int64()), "text": text}
        )

    return (
        docs.map_batches(tagged, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(resolve, batch_format="pyarrow")
        .sort("doc_id")
    )


@register(
    "b60_latest_by_key",
    """SELECT user_id, ts, event_id, value FROM (
         SELECT user_id, ts, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) WHERE rn = 1""",
)
def b60_latest_by_key(sf_dir: str) -> ray.data.Dataset:
    """Latest event per user (compact-by-key / upsert-view semantics):
    the one-liner every event-log consumer needs — keep each key's most
    recent row, ties broken by event_id DESC so the result is
    deterministic at exact-timestamp collisions. One sharded co-shuffle
    + vectorized per-run argmax (lexsort, last-of-run), one Python call
    per shard. Returns (user_id, ts, event_id, value) sorted by
    user_id."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def latest(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        last = np.r_[uid_s[1:] != uid_s[:-1], True]
        keep = pa.array(np.asarray(order)[np.flatnonzero(last)])
        return pa.table(
            {
                "user_id": pa.array(uid_s[np.flatnonzero(last)], pa.int64()),
                "ts": group.column("ts").combine_chunks().take(keep),
                "event_id": group.column("event_id").combine_chunks().take(keep).cast(pa.int64()),
                "value": group.column("value").combine_chunks().take(keep),
            }
        )

    return _pin_ts_col(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(latest, batch_format="pyarrow"),
        "ts",
    ).sort("user_id")


@register(
    "b61_window_distinct",
    """SELECT date_trunc('hour', ts) AS bucket,
              count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1""",
)
def b61_window_distinct(sf_dir: str) -> ray.data.Dataset:
    """Distinct users per tumbling hour — the COUNT(DISTINCT) window
    the b26 SUM window can't express: exact, via the two-level plan
    that scales (per-batch (bucket, user) dedup combiner → one grouped
    dedup shuffle keyed on the PAIR → per-bucket Count). The wire
    carries distinct pairs per batch, not events; no per-key Python.
    Returns (bucket, n_users) sorted by bucket.
    tests/test_window_distinct.py checks DuckDB count(distinct)
    equality."""
    from ray.data.aggregate import Count

    def pairs(b: pa.Table) -> pa.Table:
        bucket = pc.floor_temporal(b.column("ts"), unit="hour")
        t = pa.table({"bucket": bucket, "user_id": b.column("user_id")})
        return t.group_by(["bucket", "user_id"]).aggregate([]).rename_columns(
            ["bucket", "user_id"]
        )

    distinct_pairs = (
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["bucket", "user_id"])
        .aggregate(Count(alias_name="_c"))
    )

    def drop_c(b: pa.Table) -> pa.Table:
        return pa.table({"bucket": b.column("bucket")})

    counts = (
        distinct_pairs.map_batches(drop_c, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Count(alias_name="n_users"))
    )
    return _pin_ts_col(counts, "bucket").sort("bucket")


@register(
    "b62_percent_rank",
    """SELECT event_id, user_id,
              ROUND(percent_rank() OVER (
                  PARTITION BY user_id ORDER BY value, event_id), 8) AS pct_rank
       FROM events""",
)
def b62_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """percent_rank() OVER (PARTITION BY user ORDER BY value, event_id)
    — the normalized-rank window function: (rank − 1) / (n − 1) per
    user, 0 for single-row users (DuckDB semantics). One sharded
    co-shuffle + vectorized per-run ranking (lexsort + run arithmetic;
    ties share a rank exactly as SQL rank() does). Rounded to 8
    decimals, sorted by event_id.
    tests/test_wave21.py checks DuckDB percent_rank equality."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def rank_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, val, uid))
        uid_s, val_s, eid_s = uid[order], val[order], eid[order]
        n = len(uid_s)
        u_start = np.r_[True, uid_s[1:] != uid_s[:-1]]
        run_id = np.cumsum(u_start) - 1
        starts = np.flatnonzero(u_start)
        lens = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, lens)  # 0-based row number
        # SQL rank(): ties (same user, value, event_id — event_id is
        # unique, so no ties here) — rank = position
        denom = np.repeat(lens, lens) - 1
        pr = np.where(denom > 0, pos / np.maximum(denom, 1), 0.0)
        _ = run_id
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "pct_rank": pa.array(_round_half_away(pr, 8), pa.float64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
        .sort("event_id")
    )


@register(
    "b63_skew_report",
    """WITH c AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS nd FROM c),
       hot AS (SELECT k, c FROM c ORDER BY c DESC, k ASC LIMIT 1)
       SELECT tot.total AS total_rows,
              tot.nd AS "distinct",
              hot.k AS hottest_key,
              ROUND(CAST(hot.c AS DOUBLE) / tot.total, 6) AS hottest_share,
              ROUND(CAST(hot.c AS DOUBLE)
                    / (CAST(tot.total AS DOUBLE) / tot.nd), 3) AS skew_ratio,
              CAST(GREATEST(1, CEIL(
                  (CAST(hot.c AS DOUBLE)
                   / (CAST(tot.total AS DOUBLE) / tot.nd)) / 2.0)) AS BIGINT)
                AS recommended_salts
       FROM tot CROSS JOIN hot""",
)
def b63_skew_report(sf_dir: str) -> pa.Table:
    """Join-key skew advisor — the companion to b58's planner: EXACT
    per-key counts (per-batch Arrow group_by combiner → one grouped
    Sum — the same scale shape as every aggregate here; a planning
    pass earns one exact shuffle), then per-block top-1 partials merge
    driver-side into the hottest key, its global share, the
    p_max/mean skew ratio, and the salt count that would cap one
    reducer at ~2× the mean key load. On skew this is the difference
    between a wedged reducer and a flat shuffle; the advisor makes the
    decision measurable instead of folklore. Deterministic tie break
    (count DESC, key ASC). Returns one row: (total_rows, distinct,
    hottest_key, hottest_share, skew_ratio, recommended_salts)."""
    from ray.data.aggregate import Sum

    key_col = "l_orderkey"
    ds = _read(sf_dir, "lineitem", [key_col])

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = pa.table({"k": col.cast(pa.int64())})
        g = t.group_by(["k"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "c"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    distinct = counts.count()

    def top1(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({"k": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        idx = pc.sort_indices(b, sort_keys=[("c", "descending"), ("k", "ascending")])[:1]
        return b.take(idx)

    # repartition(16) bounds the driver-side merge at 16 candidate rows
    parts = [
        t
        for t in ray.get(
            counts.repartition(16)
            .map_batches(top1, batch_size=None, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_columns > 0 and t.num_rows > 0
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    best = allp.take(pc.sort_indices(allp, sort_keys=[("c", "descending"), ("k", "ascending")])[:1])
    hot_key = best.column("k")[0].as_py()
    hot_n = best.column("c")[0].as_py()
    total = sum(
        p["c"]
        for p in _tree_fold(
            counts.map_batches(
                lambda b: pa.table(
                    {"c": pa.array([int(pc.sum(b.column("c")).as_py() or 0)], pa.int64())}
                ),
                batch_format="pyarrow",
            ),
            _sum_merge,
        )
    )
    mean = total / max(distinct, 1)
    skew_ratio = hot_n / max(mean, 1e-12)
    salts = int(max(1, np.ceil(skew_ratio / 2.0)))
    return pa.table(
        {
            "total_rows": pa.array([int(total)], pa.int64()),
            "distinct": pa.array([int(distinct)], pa.int64()),
            "hottest_key": pa.array([hot_key], pa.int64()),
            "hottest_share": pa.array(
                _round_half_away(np.array([hot_n / max(total, 1)]), 6), pa.float64()
            ),
            "skew_ratio": pa.array(
                _round_half_away(np.array([skew_ratio]), 3), pa.float64()
            ),
            "recommended_salts": pa.array([salts], pa.int64()),
        }
    )


@register("data_winsorize", None)  # sketch-clipped floats → rows-only; bound-tested
def data_winsorize(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99) -> ray.data.Dataset:
    """Winsorize events.value at the approximate [p1, p99] — the
    outlier-robust scaling step: one mergeable CDF-sketch pass fixes
    the clip bounds, one vectorized clip pass applies them (the
    quantile-transform plan with a different finish). Returns
    (event_id, value, clipped) sorted by event_id; bounds and clip
    fractions are tolerance-tested against exact percentiles."""
    from ..functions.sketch import quantile_merge, quantile_partial, quantile_query

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        pts = quantile_partial(np.asarray(v, dtype=np.float64))
        return pa.table(
            {"pts": pa.array([pts.reshape(-1).tolist()], pa.list_(pa.float64()))}
        )

    ev = _read(sf_dir, "events", ["event_id", "value"]).materialize()
    def _pts_merge(b: pa.Table) -> pa.Table:
        """tree_fold merge: quantile_merge is the sketch's mergeable op."""
        if b.num_rows == 0:
            return pa.table({"pts": pa.array([], pa.list_(pa.float64()))})
        sk = quantile_merge(
            [np.asarray(x, dtype=np.float64).reshape(-1, 2) for x in b.column("pts").to_pylist()]
        )
        return pa.table({"pts": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.float64()))})

    from ..functions.fold import tree_fold

    parts = tree_fold(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True), _pts_merge
    )
    sketch = quantile_merge(
        [np.asarray(p["pts"], dtype=np.float64).reshape(-1, 2) for p in parts]
    )
    lo = quantile_query(sketch, lo_q)
    hi = quantile_query(sketch, hi_q)

    def clip(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        c = np.clip(v, lo, hi)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "value": pa.array(_round_half_away(c, 8), pa.float64()),
                "clipped": pa.array((c != v), pa.bool_()),
            }
        )

    return ev.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True).sort("event_id")


def _affine_scan(
    A: np.ndarray,
    B: np.ndarray,
    seg_starts: np.ndarray | None = None,
    max_step_len: int = 4096,
) -> np.ndarray:
    """Inclusive scan of z_t = A_t·z_{t−1} + B_t; A = 0 at segment
    starts blocks propagation across segments (ts_ewma's pattern,
    shared with the halflife variant).

    Two regimes: when ``seg_starts`` is given and every segment is
    ≤ ``max_step_len`` rows, the recurrence runs STEP-WISE, vectorized
    across segments — each step performs the recurrence's own double
    ops (A·z then + B), so the output is bit-identical to row-at-a-time
    evaluation (pandas, a SQL recursive CTE). Longer segments fall back
    to the O(log n)-pass doubling scan in plain float64 — NOT
    np.longdouble, which is 80-bit on x86 Linux but float64 on
    Windows/aarch64 and would make >max_step_len outputs
    platform-dependent (review finding); the doubling association
    already differs from sequential in the last ulps, which the
    rounding at the call sites absorbs."""
    n = len(A)
    if seg_starts is not None and n:
        lens = np.diff(np.r_[seg_starts, n])
        max_len = int(lens.max())
        if max_len <= max_step_len:
            z = np.empty(n, np.float64)
            z[seg_starts] = B[seg_starts]  # A = 0 at starts
            for k in range(1, max_len):
                act = seg_starts[lens > k] + k
                z[act] = A[act] * z[act - 1] + B[act]
            return z
    A = A.astype(np.float64)
    B = B.astype(np.float64)
    d = 1
    while d < n:
        B[d:] = B[d:] + A[d:] * B[:-d]
        A[d:] = A[d:] * A[:-d]
        d *= 2
    return B


@register(
    "ts_ewma_halflife",
    """WITH RECURSIVE o AS (
         SELECT user_id, event_id, value,
                row_number() OVER (w) AS i,
                date_diff('microsecond', lag(ts) OVER (w), ts) / 1000000.0 AS dt
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       r AS (
         SELECT user_id, event_id, i, CAST(value AS DOUBLE) AS z
         FROM o WHERE i = 1
         UNION ALL
         SELECT o.user_id, o.event_id, o.i,
                power(2.0, -o.dt / 3600.0) * r.z
                  + (1.0 - power(2.0, -o.dt / 3600.0)) * o.value
         FROM o JOIN r ON o.user_id = r.user_id AND o.i = r.i + 1)
       SELECT event_id, user_id, ROUND(z, 6) AS ewma FROM r""",
)
def ts_ewma_halflife(sf_dir: str, halflife_s: float = 3600.0) -> ray.data.Dataset:
    """Time-decayed EWMA for IRREGULARLY sampled events — the
    physically meaningful smoother when gaps vary (ts_ewma's per-event
    α treats a 1-second and a 1-week gap identically): z_t = a·z_{t−1}
    + (1−a)·v_t with a = 2^(−Δt/halflife) (Müller's operator; a young
    previous value keeps weight, a stale one decays away). Same
    sharded shuffle + O(log n) affine doubling scan as ts_ewma — the
    decay only changes the per-row A coefficients, not the plan. Each
    user's first event has A = 0 (z = v). Rounded to 6 decimals like
    ts_ewma (ADVICE r4: users with >max_step_len events fall to the
    doubling scan, whose association differs from the recursive-CTE
    oracle in last ulps — 6 decimals absorbs that boundary), sorted by
    event_id; equality vs a sequential loop reference in
    tests/test_ewma.py."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def ewma_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ewma": pa.array([], pa.float64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s, val_s, eid_s = uid[order], ts[order], val[order].astype(np.float64), eid[order]
        is_start = np.r_[True, uid_s[1:] != uid_s[:-1]]
        dt = np.r_[0, np.diff(ts_s)] / 1e6  # seconds
        a = np.exp2(-dt / halflife_s)
        A = np.where(is_start, 0.0, a)
        B = np.where(is_start, val_s, (1.0 - A) * val_s)
        z = _affine_scan(A, B, seg_starts=np.flatnonzero(is_start))
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "ewma": pa.array(_round_half_away(z, 6), pa.float64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(ewma_shard, batch_format="pyarrow")
        .sort("event_id")
    )


@register(
    "ts_event_bigrams",
    """WITH seq AS (
         SELECT user_id, event_type,
                lead(event_type) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS nxt
         FROM events)
       SELECT event_type || '→' || nxt AS pair, count(*) AS n
       FROM seq WHERE nxt IS NOT NULL
       GROUP BY 1 ORDER BY n DESC, pair LIMIT 25""",
)
def ts_event_bigrams(sf_dir: str, k: int = 25) -> pa.Table:
    """Sequential pattern mining, the simplest member: top-k
    consecutive event-type bigrams across users' time-ordered streams
    (what follows what?). One sharded co-shuffle on user, vectorized
    per-shard bigram extraction (lexsort; pairs WITHIN user runs only —
    a boundary between users never forms a bigram), per-shard Arrow
    group-count combiner, grouped Sum, per-block top-k merged
    driver-side. Deterministic ties (count DESC, pair ASC).
    tests/test_event_bigrams.py checks DuckDB lead()-window equality
    including tie order."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "event_type": b.column("event_type"),
            }
        )

    def bigrams(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
        )
        n = group.num_rows
        if n < 2:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        et = group.column("event_type").combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        et_s = et.take(pa.array(order))
        same_user = uid_s[1:] == uid_s[:-1]
        lhs = et_s.slice(0, n - 1).filter(pa.array(same_user))
        rhs = et_s.slice(1).filter(pa.array(same_user))
        pair = pc.binary_join_element_wise(lhs, rhs, "→")
        t = pa.table({"pair": pair})
        g = t.group_by(["pair"]).aggregate([([], "count_all")])
        return g.rename_columns(["pair", "c"])

    summed = (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(bigrams, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("c", alias_name="n"))
    )

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table(
                {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(b, sort_keys=[("n", "descending"), ("pair", "ascending")])[:k]
        return b.take(idx)

    # repartition(16) bounds the driver-side merge at 16·k rows (the
    # tree_fold rule); per-block top-k is exact — global winners are in
    # every covering block's top-k.
    parts = [
        t
        for t in ray.get(
            summed.repartition(16)
            .map_batches(block_topk, batch_size=None, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_columns > 0
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    idx = pc.sort_indices(allp, sort_keys=[("n", "descending"), ("pair", "ascending")])[:k]
    return allp.take(idx)


@register(
    "b64_chi_square",
    """WITH mu AS (SELECT avg(value) AS m FROM events),
       cells AS (
         SELECT event_type AS et,
                CASE WHEN value >= mu.m THEN 'high' ELSE 'low' END AS sign,
                count(*) AS c
         FROM events CROSS JOIN mu GROUP BY 1, 2),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      count(DISTINCT et) AS r, count(DISTINCT sign) AS s
               FROM cells),
       rt AS (SELECT et, CAST(sum(c) AS DOUBLE) AS rc FROM cells GROUP BY et),
       ct AS (SELECT sign, CAST(sum(c) AS DOUBLE) AS cc FROM cells GROUP BY sign),
       chi AS (
         SELECT sum((cells.c - rt.rc * ct.cc / tot.n)
                    * (cells.c - rt.rc * ct.cc / tot.n)
                    / (rt.rc * ct.cc / tot.n)) AS chi2
         FROM cells JOIN rt USING (et) JOIN ct USING (sign) CROSS JOIN tot)
       SELECT tot.n AS n, tot.r AS rows, tot.s AS cols,
              ROUND(chi.chi2, 6) AS chi2,
              CAST((tot.r - 1) * (tot.s - 1) AS BIGINT) AS dof,
              ROUND(sqrt(chi.chi2 / (tot.n * GREATEST(LEAST(tot.r, tot.s) - 1, 1))), 6)
                AS cramers_v
       FROM tot CROSS JOIN chi""",
)
def b64_chi_square(sf_dir: str) -> pa.Table:
    """Chi-square independence test between event_type and
    above-vs-below-mean value — the categorical-association
    diagnostic: one global Mean aggregate fixes the split, exact
    contingency counts come from ONE grouped aggregate (per-batch
    combiner), and the χ² statistic, degrees of freedom and Cramér's V
    are closed-form on the driver-tiny contingency table.
    Deterministic (integer counts; the statistic rounds to 6).
    tests/test_event_bigrams.py checks the statistic vs a numpy
    reference."""
    from ray.data.aggregate import Mean

    ds0 = _read(sf_dir, "events", ["event_type", "value"]).materialize()
    mu = float(ds0.aggregate(Mean("value", alias_name="m"))["m"])

    def cells(b: pa.Table) -> pa.Table:
        sign = pc.if_else(
            pc.greater_equal(b.column("value"), pa.scalar(mu)),
            pa.scalar("high"),
            pa.scalar("low"),
        )
        t = pa.table({"et": b.column("event_type"), "sign": sign})
        g = t.group_by(["et", "sign"]).aggregate([([], "count_all")])
        return g.rename_columns(["et", "sign", "c"])

    from ray.data.aggregate import Sum

    counts = (
        ds0.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["et", "sign"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    ets = sorted({r["et"] for r in counts})
    signs = sorted({r["sign"] for r in counts})
    M = np.zeros((len(ets), len(signs)), dtype=np.float64)
    for r in counts:
        M[ets.index(r["et"]), signs.index(r["sign"])] = r["c"]
    n = M.sum()
    expected = np.outer(M.sum(axis=1), M.sum(axis=0)) / n
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = float(np.nansum((M - expected) ** 2 / np.where(expected > 0, expected, np.nan)))
    dof = (len(ets) - 1) * (len(signs) - 1)
    cramers_v = float(np.sqrt(chi2 / (n * max(min(len(ets), len(signs)) - 1, 1)))) if n else 0.0
    return pa.table(
        {
            "n": pa.array([int(n)], pa.int64()),
            "rows": pa.array([len(ets)], pa.int64()),
            "cols": pa.array([len(signs)], pa.int64()),
            "chi2": pa.array(_round_half_away(np.array([chi2]), 6), pa.float64()),
            "dof": pa.array([dof], pa.int64()),
            "cramers_v": pa.array(
                _round_half_away(np.array([cramers_v]), 6), pa.float64()
            ),
        }
    )


# --------------------------------- B65: per-group top-N rows

@register(
    "b65_grouped_topn",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def b65_grouped_topn(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-group top-N rows (each customer's 3 priciest orders) — the
    windowed companion to b20's global top-k: one sharded co-shuffle on
    o_custkey % SHARDS, then a fully vectorized per-shard ranking
    (lexsort on (custkey, −price, orderkey), run detection, position
    within run) — no per-customer Python, no global sort. Prices are
    copied verbatim (no arithmetic), so the result is hash-exact
    against the SQL window. At 100 TB this is the standard
    \"N rows per key\" reducer: shuffle volume is the input, reducer
    state one run at a time. NB: the registered oracle pins the default
    k=3; a caller passing another k gets a result the oracle does not
    model."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("o_custkey"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "o_custkey": key,
                "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
                "o_totalprice": b.column("o_totalprice"),
            }
        )

    def topn_shard(group: pa.Table, k: int = k) -> pa.Table:
        empty = pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "rn": pa.array([], pa.int64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        cust = group.column("o_custkey").combine_chunks().to_numpy(zero_copy_only=False)
        okey = group.column("o_orderkey").combine_chunks().to_numpy(zero_copy_only=False)
        price = group.column("o_totalprice").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -price, cust))
        cust_s, okey_s, price_s = cust[order], okey[order], price[order]
        starts = np.nonzero(np.r_[True, cust_s[1:] != cust_s[:-1]])[0]
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        keep = pos < k
        return pa.table(
            {
                "o_custkey": pa.array(cust_s[keep], pa.int64()),
                "o_orderkey": pa.array(okey_s[keep], pa.int64()),
                "o_totalprice": pa.array(price_s[keep], pa.float64()),
                "rn": pa.array(pos[keep] + 1, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(topn_shard, batch_format="pyarrow")
    )


# --------------------------------- ts: rolling z-score anomaly flags

@register(
    "ts_anomaly_zscore",
    """SELECT event_id, user_id,
              ROUND(CASE WHEN sd > 0
                         THEN (CAST(cents AS DOUBLE) - mu) / sd
                         ELSE 0.0 END, 8) AS z,
              CASE WHEN sd > 0
                   THEN abs((CAST(cents AS DOUBLE) - mu) / sd) > 3.0
                   ELSE FALSE END AS is_anomaly
       FROM (
         SELECT event_id, user_id, cents,
                CAST(s AS DOUBLE) / c AS mu,
                sqrt(GREATEST(CAST(q AS DOUBLE) / c
                              - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c),
                              0.0)) AS sd
         FROM (
           SELECT event_id, user_id, cents,
                  sum(cents) OVER w AS s,
                  sum(cents * cents) OVER w AS q,
                  count(*) OVER w AS c
           FROM (SELECT event_id, user_id, ts,
                        CAST(ROUND(value * 100) AS BIGINT) AS cents
                 FROM events)
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)))""",
)
def ts_anomaly_zscore(sf_dir: str) -> ray.data.Dataset:
    """Rolling-window anomaly detection — each event's z-score against
    its user's trailing 6-event window (the monitoring primitive next
    to the EWMA smoothers). Values quantize to EXACT integer cents
    (the b52 rule) so the rolling Σv and Σv² are exact integers and the
    final float expression — evaluated in the same operation order as
    the SQL oracle — is bit-exact: mean = s/c, var = max(q/c − mean²,
    0), z = (v − mean)/σ, flag at |z| > 3. One sharded co-shuffle +
    5 sliding adds per shard (exact int64 window sums bounded at
    6·max v², overflow-guarded — no shard-global cumsum). Sorted by
    event_id."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        cents = _round_half_away(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def z_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "z": pa.array([], pa.float64()),
                "is_anomaly": pa.array([], pa.bool_()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        cents = group.column("cents").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, v = uid[order], eid[order], cents[order]
        starts = np.nonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])[0]
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        width = np.minimum(pos, 5) + 1
        # Window sums via 5 sliding adds, NOT a shard-global cumsum: a
        # running Σv² of cents² across a whole shard group wraps int64
        # silently at scale (ADVICE r4) even though each 6-row window is
        # tiny.  Direct sums bound every intermediate at 6·max(v²); the
        # guard makes the one remaining overflow mode loud.
        cmax = int(np.abs(v).max()) if n else 0
        if cmax > 1_238_000_000:  # floor(sqrt(2**63 / 6))
            raise OverflowError(
                f"ts_anomaly_zscore: |cents| up to {cmax} would overflow the "
                "exact int64 6-row window sums (bound ~1.238e9)"
            )
        vv = v * v
        s = v.copy()
        q = vv.copy()
        for k in range(1, 6):
            idx = np.nonzero(pos >= k)[0]
            s[idx] += v[idx - k]
            q[idx] += vv[idx - k]
        c = width.astype(np.float64)
        mu = s.astype(np.float64) / c
        var = np.maximum(q.astype(np.float64) / c - mu * mu, 0.0)
        sd = np.sqrt(var)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd > 0, (v.astype(np.float64) - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "z": pa.array(_round_half_away(z, 8), pa.float64()),
                "is_anomaly": pa.array((sd > 0) & (np.abs(z) > 3.0), pa.bool_()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(z_shard, batch_format="pyarrow")
        .sort("event_id")
    )


# --------------------------------- B66: FILTER-clause conditional aggregates

@register(
    "b66_conditional_agg",
    """SELECT l_returnflag,
              count(*) AS n_rows,
              count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
              CAST(COALESCE(sum(CAST(l_quantity AS BIGINT))
                   FILTER (WHERE l_tax = 0.0), 0) AS BIGINT) AS qty_taxfree,
              count(*) FILTER (WHERE l_linestatus = 'O') AS n_open
       FROM lineitem GROUP BY l_returnflag""",
)
def b66_conditional_agg(sf_dir: str) -> ray.data.Dataset:
    """Conditional (FILTER-clause) aggregates — several differently-
    masked aggregates of one scan in ONE pass: per-batch boolean masks
    feed an Arrow group_by combiner, one grouped Sum merges, exact
    integers end to end (quantities are integer-valued by generation).
    The multi-metric fused-scan shape every reporting pipeline needs —
    at 100 TB the alternative (one scan per metric) multiplies read
    cost by the metric count."""

    def partial(b: pa.Table) -> pa.Table:
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        tax = b.column("l_tax").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        status = b.column("l_linestatus")
        open_mask = pc.equal(status, pa.scalar("O")).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "n_rows": pa.array(np.ones(b.num_rows, np.int64)),
                "n_discounted": pa.array((disc > 0.05).astype(np.int64)),
                "qty_taxfree": pa.array(
                    np.where(tax == 0.0, qty, 0.0).astype(np.int64)
                ),
                "n_open": pa.array(open_mask.astype(np.int64)),
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("n_rows", "sum"), ("n_discounted", "sum"), ("qty_taxfree", "sum"), ("n_open", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "n_rows", "n_discounted", "qty_taxfree", "n_open"]
        )

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_discount", "l_tax", "l_quantity", "l_linestatus"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_discounted", alias_name="n_discounted"),
            Sum("qty_taxfree", alias_name="qty_taxfree"),
            Sum("n_open", alias_name="n_open"),
        )
    )


# --------------------------------- ts: lag-feature generation

@register(
    "ts_lag_features",
    """SELECT event_id, user_id,
              value,
              lag(value) OVER w AS lag1,
              lag(value, 2) OVER w AS lag2,
              value - lag(value) OVER w AS delta1
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def ts_lag_features(sf_dir: str) -> ray.data.Dataset:
    """Per-key lag features — the autoregressive feature generator of
    any tabular-ML / time-series pipeline: each event carries its own
    value, the previous two values in its user's stream, and the first
    difference (NULL where the lag runs off the stream's start). One
    sharded co-shuffle + per-shard vectorized shifts with run-boundary
    masking; values are copied and the delta subtracts the identical
    doubles the SQL window sees, so the result is hash-exact without
    rounding. Sorted by event_id."""
    from ..stages.dedup import SHARDS

    def add_shard(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("user_id"), pa.int64())
        return pa.table(
            {
                "shard": _key_shard(key, SHARDS),
                "user_id": key,
                "ts": b.column("ts"),
                "event_id": pc.cast(b.column("event_id"), pa.int64()),
                "value": b.column("value"),
            }
        )

    def lag_shard(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "lag1": pa.array([], pa.float64()),
                "lag2": pa.array([], pa.float64()),
                "delta1": pa.array([], pa.float64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        uid = group.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
        ts = group.column("ts").combine_chunks().to_numpy(zero_copy_only=False)
        eid = group.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
        val = group.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, v = uid[order], eid[order], val[order]
        starts = np.nonzero(np.r_[True, uid_s[1:] != uid_s[:-1]])[0]
        pos = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        lag1 = np.r_[np.nan, v[:-1]]
        lag2 = np.r_[np.nan, np.nan, v[:-2]] if n >= 2 else np.full(n, np.nan)
        m1 = pos >= 1
        m2 = pos >= 2
        delta = v - lag1
        return pa.table(
            {
                "event_id": pa.array(eid_s, pa.int64()),
                "user_id": pa.array(uid_s, pa.int64()),
                "value": pa.array(v, pa.float64()),
                "lag1": pa.array(np.where(m1, lag1, np.nan), pa.float64(), mask=~m1),
                "lag2": pa.array(np.where(m2, lag2, np.nan), pa.float64(), mask=~m2),
                "delta1": pa.array(np.where(m1, delta, np.nan), pa.float64(), mask=~m1),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(lag_shard, batch_format="pyarrow")
        .sort("event_id")
    )
