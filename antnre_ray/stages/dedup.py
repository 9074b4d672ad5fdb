"""Near-duplicate detection stages: MinHash+LSH, exact n-gram Jaccard
verification, SimHash, and embedding-cosine near-dup.

Shapes (all shuffle-by-bucket, never all-pairs):

  docs ─ map_batches(signatures + band keys, exploded per band)
       ─ groupby(band, key % SHARDS) → vectorized run-detect, pairwise
         check inside each equal-key bucket (see SHARDS note below)
       ─ groupby(doc_a, doc_b) → distinct verified pairs

Candidate generation carries the per-doc signature (512 B) into each of
the 16 band rows — document TEXT never enters the wide exchange; the
exact-Jaccard variant joins text back onto the (tiny) candidate pair
list instead. Buckets are capped (default 64 docs) so a degenerate key
(e.g. empty docs) cannot go quadratic; truncation is DETERMINISTIC
(lowest doc ids kept) and logged — no silent caps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max

from ..functions.minhash import (
    BANDS,
    NUM_PERM,
    band_keys,
    exact_jaccard,
    hamming64,
    minhash_signatures,
    simhash_band_keys,
    simhash_signatures,
)

MAX_BUCKET = 64

_logger = None


def _log_truncation(which: str, size: int) -> None:
    """No silent caps: oversized LSH buckets are truncated (to the
    lowest-id members, deterministically) and the drop is logged."""
    global _logger
    if _logger is None:
        import logging

        _logger = logging.getLogger(__name__)
    _logger.warning(
        "%s bucket of %d docs truncated to %d lowest ids (degenerate key; "
        "consider more bands/planes or a pre-filter)", which, size, MAX_BUCKET
    )



def _pairs_schema(extra: str) -> pa.Schema:
    return pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), (extra, pa.float64())]
    )


# ------------------------------------------------------------ MinHash + LSH

# Bucket SHARDS: grouping the band shuffle by the raw (band, key) makes
# one map_groups Python call per bucket — at sf0.1 that is ~300k mostly-
# singleton groups and the per-group call overhead dominates the stage.
# Instead rows shard on key % SHARDS: each (band, shard) group holds many
# COMPLETE buckets (a bucket's key pins its shard) and is processed with
# one vectorized run-detection pass. At larger data, raise SHARDS so a
# shard still fits a reducer — the knob the raw-key plan lacks a use for.
SHARDS = 251


def minhash_band_rows(batch: pa.Table, k: int = 3, seed: int = 42) -> pa.Table:
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = minhash_signatures(texts, k=k, seed=seed)
    keys = band_keys(sigs)
    n = len(texts)
    band = np.tile(np.arange(BANDS, dtype=np.int32), n)
    keys_flat = keys.reshape(-1)
    return pa.table(
        {
            "band": pa.array(band, pa.int32()),
            "shard": pa.array((keys_flat % np.uint64(SHARDS)).astype(np.int32), pa.int32()),
            "key": pa.array(keys_flat.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, BANDS), pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.repeat(sigs, BANDS, axis=0).reshape(-1).view(np.int64), pa.int64()), NUM_PERM
            ),
        }
    )


def _key_runs(keys: np.ndarray):
    """(starts, ends) of equal-key runs in a SORTED key array."""
    starts = np.nonzero(np.r_[True, keys[1:] != keys[:-1]])[0]
    ends = np.r_[starts[1:], len(keys)]
    return starts, ends


def _shard_pairs_minhash(group: pa.Table, threshold: float = 0.7) -> pa.Table:
    """All buckets of one (band, shard) group, vectorized: sort by
    (key, doc_id), detect equal-key runs, pairwise only inside runs of
    ≥2. Pair output is identical to the per-bucket plan (same
    deterministic doc_id-ordered truncation)."""
    n = group.num_rows
    if n < 2:
        return pa.Table.from_pylist([], schema=_pairs_schema("est_jaccard"))
    keys = group.column("key").to_numpy(zero_copy_only=False)
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    sig = group.column("sig")
    if isinstance(sig, pa.ChunkedArray):
        sig = sig.combine_chunks()
    sigs = sig.flatten().to_numpy(zero_copy_only=False).reshape(n, NUM_PERM)
    order = np.lexsort((doc_ids, keys))
    keys, doc_ids, sigs = keys[order], doc_ids[order], sigs[order]
    a_out, b_out, est_out = [], [], []
    for s, e in zip(*_key_runs(keys)):
        if e - s < 2:
            continue
        if e - s > MAX_BUCKET:
            _log_truncation("minhash", int(e - s))
        ids_b = doc_ids[s:e][:MAX_BUCKET]
        sig_b = sigs[s:e][:MAX_BUCKET]
        m = len(ids_b)
        for i in range(m - 1):
            if ids_b[i + 1] == ids_b[i]:
                continue  # same doc in one bucket twice (shouldn't happen per band)
            est = (sig_b[i + 1 :] == sig_b[i]).mean(axis=1)
            hit = np.nonzero(est >= threshold)[0]
            for j in hit:
                if ids_b[i + 1 + j] != ids_b[i]:
                    a_out.append(int(ids_b[i]))
                    b_out.append(int(ids_b[i + 1 + j]))
                    est_out.append(float(est[j]))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "est_jaccard": pa.array(est_out, pa.float64()),
        }
    )


def minhash_dedup_pairs(
    docs: ray.data.Dataset, threshold: float = 0.7, k: int = 3, seed: int = 42
) -> ray.data.Dataset:
    """documents(doc_id, text) → distinct candidate pairs with
    signature-estimated Jaccard ≥ threshold."""
    bands = docs.map_batches(
        minhash_band_rows, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"k": k, "seed": seed}
    )
    pairs = bands.groupby(["band", "shard"]).map_groups(
        _shard_pairs_minhash, batch_format="pyarrow", fn_kwargs={"threshold": threshold}
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# ------------------------------------- exact n-gram Jaccard verified variant

def _verify_jaccard(batch: pa.Table, threshold: float = 0.6, k: int = 3) -> pa.Table:
    """Exact word-k-gram Jaccard per candidate row (text_a, text_b)."""
    texts_a = batch.column("text_a").to_pylist()
    texts_b = batch.column("text_b").to_pylist()
    j = np.array([exact_jaccard(a, b, k=k) for a, b in zip(texts_a, texts_b)], dtype=np.float64)
    t = pa.table(
        {
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "jaccard": pa.array(j, pa.float64()),
        }
    )
    return t.filter(pa.array(j >= threshold))


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, threshold: float = 0.6, k: int = 3, seed: int = 42
) -> ray.data.Dataset:
    """MinHash-LSH candidates verified by EXACT word-k-gram Jaccard.

    Candidates→verify plan: only (doc_id, signature) band rows go through
    the wide band shuffle — document text never does (the previous plan
    duplicated the full text into all 16 band rows, a 16× amplification
    through the exchange). The candidate pair list, tiny relative to the
    corpus, then hash-joins the text back (doc_a side, doc_b side) for
    the exact check. Bucket membership and truncation are identical to
    the signature variant (same sigs → same band keys), so the pair set
    matches the old plan exactly.
    """
    from ..config import shuffle_width

    nparts = shuffle_width()
    bands = docs.map_batches(
        minhash_band_rows, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"k": k, "seed": seed}
    )
    # threshold=0.0 keeps EVERY colliding pair as a candidate; the exact
    # verification below is the only filter (matches the old text plan).
    cands = bands.groupby(["band", "shard"]).map_groups(
        _shard_pairs_minhash, batch_format="pyarrow", fn_kwargs={"threshold": 0.0}
    )
    cands = (
        cands.groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
        .select_columns(["doc_a", "doc_b"])
        # zero-column-block guard: the pair aggregate's key cardinality
        # is the number of CANDIDATE PAIRS — small for a low-duplicate
        # corpus, while its hash-partition count equals the upstream
        # block count, so empty (schemaless) partitions are likely at
        # scale and the text join below rejects them. The pair list is
        # tiny by design, so this repartition is cheap; the count()
        # early-exit covers the all-empty case repartition can't heal.
        .repartition(nparts)
        .materialize()
    )
    if cands.count() == 0:
        return ray.data.from_arrow(_pairs_schema("jaccard").empty_table())

    # ONE text join, not two: each pair explodes to its two (role, key)
    # rows, joins docs once, then a per-pair group reassembles both
    # texts. Halves the all-to-all count of the naive join-per-side plan.
    def explode_roles(b: pa.Table) -> pa.Table:
        def arr(col):
            c = b.column(col)
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        a, bb = arr("doc_a"), arr("doc_b")
        return pa.table(
            {
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([bb, bb]),
                "role": pa.array([0] * b.num_rows + [1] * b.num_rows, pa.int8()),
                "key": pa.concat_arrays([a, bb]),
            }
        )

    roles = cands.map_batches(explode_roles, batch_format="pyarrow", zero_copy_batch=True)
    j = roles.join(docs, join_type="inner", num_partitions=nparts, on=("key",), right_on=("doc_id",))

    def assemble_pair(group: pa.Table) -> pa.Table:
        role = group.column("role").to_numpy(zero_copy_only=False)
        texts = group.column("text").to_pylist()
        i_a = np.nonzero(role == 0)[0]
        i_b = np.nonzero(role == 1)[0]
        if not len(i_a) or not len(i_b):
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 "text_a": pa.array([], pa.string()), "text_b": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "doc_a": group.column("doc_a").take(pa.array(i_a[:1])),
                "doc_b": group.column("doc_b").take(pa.array(i_b[:1])),
                "text_a": pa.array([texts[i_a[0]]], pa.string()),
                "text_b": pa.array([texts[i_b[0]]], pa.string()),
            }
        )

    pairs_with_text = j.groupby(["doc_a", "doc_b"]).map_groups(
        assemble_pair, batch_format="pyarrow"
    )
    return pairs_with_text.map_batches(
        _verify_jaccard,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"threshold": threshold, "k": k},
    )


# ------------------------------------------------------------------ SimHash

def simhash_rows(batch: pa.Table, seed: int = 42) -> pa.Table:
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = simhash_signatures(texts, seed=seed)
    chunks = simhash_band_keys(sigs)  # [n, 4]
    n = len(texts)
    keys_flat = chunks.reshape(-1)
    return pa.table(
        {
            "chunk": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
            "shard": pa.array((keys_flat % np.uint64(SHARDS)).astype(np.int32), pa.int32()),
            "key": pa.array(keys_flat.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, 4), pa.int64()),
            "sig": pa.array(np.repeat(sigs, 4).view(np.int64), pa.int64()),
        }
    )


def _shard_pairs_simhash(group: pa.Table, max_hamming: int = 3) -> pa.Table:
    if group.num_rows < 2:
        return pa.Table.from_pylist([], schema=_pairs_schema("hamming"))
    keys = group.column("key").to_numpy(zero_copy_only=False)
    doc_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = group.column("sig").to_numpy(zero_copy_only=False).view(np.uint64)
    order = np.lexsort((doc_ids, keys))
    keys, doc_ids, sigs = keys[order], doc_ids[order], sigs[order]
    a_out, b_out, h_out = [], [], []
    for s, e in zip(*_key_runs(keys)):
        if e - s < 2:
            continue
        if e - s > MAX_BUCKET:
            _log_truncation("simhash", int(e - s))
        ids_b = doc_ids[s:e][:MAX_BUCKET]
        sig_b = sigs[s:e][:MAX_BUCKET]
        for i in range(len(ids_b) - 1):
            ham = hamming64(np.repeat(sig_b[i], len(sig_b) - i - 1), sig_b[i + 1 :])
            for j in np.nonzero(ham <= max_hamming)[0]:
                if ids_b[i + 1 + j] != ids_b[i]:
                    a_out.append(int(ids_b[i]))
                    b_out.append(int(ids_b[i + 1 + j]))
                    h_out.append(float(ham[j]))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "hamming": pa.array(h_out, pa.float64()),
        }
    )


def simhash_dedup_pairs(docs: ray.data.Dataset, max_hamming: int = 3, seed: int = 42) -> ray.data.Dataset:
    rows = docs.map_batches(
        simhash_rows, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"seed": seed}
    )
    pairs = rows.groupby(["chunk", "shard"]).map_groups(
        _shard_pairs_simhash, batch_format="pyarrow", fn_kwargs={"max_hamming": max_hamming}
    )
    # Distinct pairs: hamming of a fixed (a, b) pair is identical in every
    # chunk-bucket it collides in, so any per-pair reducer (Max here) is
    # just dedup — Max == Min for this column.
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("hamming", alias_name="hamming"))


# -------------------------------------------- embedding-cosine near-dup

N_PLANES = 12
N_TABLES = 4


def _hyperplanes(dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N_TABLES, N_PLANES, dim)).astype(np.float64)


def embedding_bucket_rows(batch: pa.Table, dim: int = 64, seed: int = 42) -> pa.Table:
    """Random-hyperplane LSH: sign pattern per table → bucket key."""
    planes = _hyperplanes(dim, seed)  # deterministic per task, cheap
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    X = emb.flatten().to_numpy(zero_copy_only=False).reshape(batch.num_rows, dim).astype(np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    tables = []
    pw = (np.int64(1) << np.arange(N_PLANES, dtype=np.int64))
    for t in range(N_TABLES):
        signs = (Xn @ planes[t].T) > 0  # [n, planes]
        key = (signs.astype(np.int64) * pw[None, :]).sum(axis=1)
        tables.append(
            pa.table(
                {
                    "table": pa.array(np.full(len(ids), t, dtype=np.int32), pa.int32()),
                    "shard": pa.array((key % SHARDS).astype(np.int32), pa.int32()),
                    "key": pa.array(key, pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array(Xn.reshape(-1), pa.float64()), dim
                    ),
                }
            )
        )
    return pa.concat_tables(tables)


def _shard_pairs_cosine(group: pa.Table, threshold: float = 0.95) -> pa.Table:
    if group.num_rows < 2:
        return pa.Table.from_pylist(
            [], schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()), ("cosine", pa.float64())])
        )
    keys = group.column("key").to_numpy(zero_copy_only=False)
    ids = group.column("vec_id").to_numpy(zero_copy_only=False)
    vec = group.column("vec")
    if isinstance(vec, pa.ChunkedArray):
        vec = vec.combine_chunks()
    dim = vec.type.list_size
    X = vec.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), dim)
    order = np.lexsort((ids, keys))
    keys, ids, X = keys[order], ids[order], X[order]
    a_out, b_out, c_out = [], [], []
    for s, e in zip(*_key_runs(keys)):
        if e - s < 2:
            continue
        if e - s > MAX_BUCKET * 4:
            _log_truncation("embedding-cosine", int(e - s))
        ids_b = ids[s:e][: MAX_BUCKET * 4]
        Xb = X[s:e][: MAX_BUCKET * 4]
        cos = Xb @ Xb.T
        iu, ju = np.triu_indices(len(ids_b), k=1)
        hits = np.nonzero(cos[iu, ju] >= threshold)[0]
        for h in hits:
            i, j = iu[h], ju[h]
            if ids_b[i] != ids_b[j]:
                a_out.append(int(ids_b[i]))
                b_out.append(int(ids_b[j]))
                c_out.append(float(cos[i, j]))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "cosine": pa.array(c_out, pa.float64()),
        }
    )


def embedding_dedup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.95, dim: int = 64, seed: int = 42
) -> ray.data.Dataset:
    rows = embeddings.map_batches(
        embedding_bucket_rows, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"dim": dim, "seed": seed}
    )
    pairs = rows.groupby(["table", "shard"]).map_groups(
        _shard_pairs_cosine, batch_format="pyarrow", fn_kwargs={"threshold": threshold}
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Max("cosine", alias_name="cosine"))


# ---------------------------------------------------------- keep/drop list

def apply_drop_list(docs: ray.data.Dataset, drops: ray.data.Dataset) -> ray.data.Dataset:
    """documents minus the drop list, as a native LEFT ANTI hash join:
    both sides shuffle once on doc_id, no broadcast — the drop list can
    be a large fraction of the corpus at 100 TB (dedup rates of 30%+ are
    normal for web crawl), so shipping it to every task would not scale.
    (A tagged-union groupby + per-key map_groups computes the same thing
    but pays one Python call per document; the join keeps it columnar.)"""
    from ..config import shuffle_width

    def drop_keys(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id")})

    # zero-column-block guard: drops is typically drop_list()'s grouped
    # aggregate, whose key cardinality (docs to drop) can sit far below
    # its hash-partition count (= upstream block count) — empty
    # partitions emit schemaless blocks the anti join rejects. The
    # count() early-exit covers the ZERO-duplicates case (all-empty
    # datasets lose their schema even through repartition, and "nothing
    # to drop" is exactly docs); the healing repartition is paid ONLY
    # when empty hash partitions are plausible (< 64 keys per block —
    # beyond that, P(any empty) ≤ blocks·e^-64 ≈ 0), so the dense 30 %-
    # of-corpus drop lists the docstring designs for stream into the
    # anti join's own shuffle with just the one materialize pass.
    keys = drops.map_batches(
        drop_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_keys = keys.count()
    if n_keys == 0:
        return docs
    if n_keys < 64 * keys.num_blocks():
        keys = keys.repartition(shuffle_width()).materialize()
    return docs.join(
        keys,
        join_type="left_anti",
        num_partitions=shuffle_width(),
        on=("doc_id",),
    )


def drop_list(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Duplicate pairs → docs to DROP: the higher id of each pair (the
    canonical survivor is the lowest id in each duplicate cluster).
    Distinct via a grouped COUNT (columnar) — a per-group map_groups
    would pay one Python call per mostly-singleton id (the SHARDS
    anti-pattern documented above)."""
    from ray.data.aggregate import Count

    def pick(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_b")})

    dropped = pairs.map_batches(pick, batch_format="pyarrow")
    return dropped.groupby("doc_id").aggregate(Count(alias_name="_n")).select_columns(["doc_id"])


# ------------------------------------- incremental dedup (persisted index)

def build_minhash_index(
    docs: ray.data.Dataset, index_path: str, overwrite: bool = False
) -> str:
    """Persist the corpus's LSH band table so NEW documents can be
    deduped against an EXISTING corpus without rescanning it — the
    production shape of continuous ingest at 100 TB. One streamed pass
    over (doc_id, text): per-doc minhash signatures explode to one row
    per band, written parquet-partitioned by ``key % SHARDS`` (251
    dirs), so a query touches only the shards its band keys hash into.
    Signatures (512 B/doc) are stored; text never is.

    Idempotent + atomic via the MANIFEST-FILE commit shared with the
    ANN indexes (similarity._commit_index_build): shards land under a
    fresh ``<index>/<build-id>/`` on the target pyarrow filesystem
    (any URI), then one ``_manifest.json`` write publishes them — no
    rename, object-store-safe, crashed builds invisible."""
    import uuid

    from .similarity import _commit_index_build, _index_filesystem, _index_is_built

    if _index_is_built(index_path) and not overwrite:
        return index_path
    build_id = f"build-{uuid.uuid4().hex[:8]}"
    filesystem, root = _index_filesystem(index_path)
    build_root = f"{root.rstrip('/')}/{build_id}"

    def rows(b: pa.Table) -> pa.Table:
        t = minhash_band_rows(b)
        # 'bshard' becomes the hive partition dir; 'shard' stays in-file
        # (explicit file-list reads don't re-infer hive columns).
        return t.append_column("bshard", t.column("shard"))

    docs.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        build_root, filesystem=filesystem, partition_cols=["bshard"]
    )
    _commit_index_build(index_path, build_id, {})
    return index_path


def query_minhash_index(
    index_path: str, new_docs: pa.Table, threshold: float = 0.5
) -> pa.Table:
    """Near-duplicate pairs between ``new_docs`` (doc_id, text — one
    ingest batch, driver-sized) and the indexed corpus: (new_doc_id,
    corpus_doc_id, est_jaccard ≥ threshold).

    Reads ONLY the key-shard directories the new docs' band keys hash
    into (≤ BANDS·|new| of 251), matches exact (band, key) buckets via
    a sorted-unique searchsorted probe table (every new doc sharing a
    bucket pairs with each matching corpus row), and estimates Jaccard
    by signature agreement — the whole corpus is never touched."""
    ids = new_docs.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = minhash_signatures(new_docs.column("text").to_pylist())
    keys = band_keys(sigs)  # [n, BANDS] uint64
    n = len(ids)
    if n == 0:
        return _pairs_schema("est_jaccard").empty_table()
    band = np.tile(np.arange(BANDS, dtype=np.int64), n)
    keys_flat = keys.reshape(-1)
    shards = (keys_flat % np.uint64(SHARDS)).astype(np.int64)
    # (band, key) lookup keys for the vectorized bucket match below.
    probe = (band.astype(np.int64) << np.int64(48)) ^ keys_flat.view(np.int64)
    from .similarity import _shard_files

    files, filesystem = _shard_files(
        index_path, [f"bshard={s}" for s in sorted(set(shards.tolist()))]
    )
    if not files:
        return _pairs_schema("est_jaccard").empty_table()
    import pyarrow.parquet as pq

    a_out, b_out, j_out = [], [], []
    seen: set[tuple[int, int]] = set()
    # Sorted-unique probe table with per-value member lists: TWO new
    # docs can share a (band, key) bucket, and each matching corpus row
    # must pair with EVERY one of them — a first-match lookup
    # (pc.index_in) would silently admit the later docs as novel.
    order = np.argsort(probe, kind="stable")
    uq, uq_start, uq_cnt = np.unique(probe[order], return_index=True, return_counts=True)
    for fpath in files:
        t = pq.read_table(fpath, columns=["band", "key", "doc_id", "sig"], filesystem=filesystem)
        if t.num_rows == 0:
            continue
        ib = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        ik = t.column("key").to_numpy(zero_copy_only=False)
        idx_key = (ib << np.int64(48)) ^ ik
        pos = np.searchsorted(uq, idx_key)
        pos_c = np.minimum(pos, len(uq) - 1)
        rows_hit = np.nonzero(uq[pos_c] == idx_key)[0]
        if rows_hit.size == 0:
            continue
        # Expand each hit corpus row to all new docs in its bucket via
        # repeat + range arithmetic (the b46/set-join expansion shape).
        g = pos_c[rows_hit]
        c = uq_cnt[g]
        total = int(c.sum())
        rows_rep = np.repeat(rows_hit, c)
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[np.int64(0), np.cumsum(c)[:-1]], c
        )
        new_i = (order[np.repeat(uq_start[g], c) + intra] // BANDS).astype(np.int64)
        corpus_ids = t.column("doc_id").to_numpy(zero_copy_only=False)[rows_rep]
        sig_col = t.column("sig").combine_chunks()
        corpus_sigs = (
            sig_col.flatten().to_numpy(zero_copy_only=False).reshape(t.num_rows, NUM_PERM)[rows_rep]
        )
        est = (sigs[new_i].view(np.int64) == corpus_sigs).mean(axis=1)
        for ni, ci, e in zip(new_i, corpus_ids, est):
            key2 = (int(ids[ni]), int(ci))
            if e >= threshold and key2 not in seen:
                seen.add(key2)
                a_out.append(key2[0])
                b_out.append(key2[1])
                j_out.append(float(e))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "est_jaccard": pa.array(j_out, pa.float64()),
        }
    )


# ------------------------------- exact substring (token-window) dedup

SUBSTR_PRIME = np.uint64(1099511628211)  # FNV-64 prime (analyze._DECON_PRIME)


def _window_rows(batch: pa.Table, w: int) -> pa.Table:
    """Per document: 64-bit rolling hashes of every w-token window,
    exploded to (shard, h, doc_id, pos) rows. Token hashes come from one
    vectorized polars_u64 pass per doc; the window combine loops over w
    (vectorized across windows), never over windows. Only these 20-byte
    rows enter the shuffle — document text never does."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.hashing import polars_u64

    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    h_parts, d_parts, p_parts = [], [], []
    for did, t in zip(doc_ids, texts):
        toks = (t or "").split()
        if len(toks) < w:
            continue
        th = polars_u64(pa.array(toks))
        win = sliding_window_view(th, w)
        h = win[:, 0].copy()
        for i in range(1, w):
            h = h * SUBSTR_PRIME + win[:, i]
        h_parts.append(h)
        d_parts.append(np.full(len(h), did, dtype=np.int64))
        p_parts.append(np.arange(len(h), dtype=np.int64))
    if not h_parts:
        return pa.table(
            {
                "shard": pa.array([], pa.int32()),
                "h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
    h = np.concatenate(h_parts)
    return pa.table(
        {
            "shard": pa.array((h % np.uint64(SHARDS)).astype(np.int32), pa.int32()),
            "h": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.concatenate(d_parts), pa.int64()),
            "pos": pa.array(np.concatenate(p_parts), pa.int64()),
        }
    )


def _dup_occurrences(group: pa.Table) -> pa.Table:
    """One hash shard: sort by (h, doc_id, pos) and emit every NON-FIRST
    member of each equal-hash run — the occurrences to remove. The keeper
    (lexicographic min (doc_id, pos)) is partition-invariant; the whole
    pass is one lexsort + one mask, no per-run Python."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())})
    n = group.num_rows
    if n < 2:
        return empty
    h = group.column("h").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    pos = group.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, doc, h))
    h, doc, pos = h[order], doc[order], pos[order]
    is_first = np.r_[True, h[1:] != h[:-1]]
    if is_first.all():
        return empty
    drop = ~is_first
    return pa.table(
        {"doc_id": pa.array(doc[drop], pa.int64()), "pos": pa.array(pos[drop], pa.int64())}
    )


def _merge_spans(group: pa.Table, w: int) -> pa.Table:
    """One doc_id shard: merge each document's marked windows [pos,
    pos+w) into disjoint token intervals, emitted as ONE row per doc
    (doc_id, spans, removed_tokens) where ``spans`` packs the interval
    pairs [s0,e0,s1,e1,...] as little-endian int64 BINARY — Acero hash
    joins reject list-typed payload columns, binary passes through.
    Because every interval has the same length w, a sorted-pos merge is
    a single vectorized break-detection pass (pos > prev_pos + w); the
    per-doc blobs are zero-copy slices of one interleaved buffer — no
    per-doc Python loop."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "spans": pa.array([], pa.binary()),
            "removed_tokens": pa.array([], pa.int64()),
        }
    )
    n = group.num_rows
    if n == 0:
        return empty
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    pos = group.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    brk = np.r_[True, (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + w)]
    s_idx = np.nonzero(brk)[0]
    e_idx = np.r_[s_idx[1:], n] - 1
    m_doc = doc[s_idx]
    m_start = pos[s_idx]
    m_end = pos[e_idx] + w
    # group merged intervals into per-doc blobs (m_doc is sorted)
    d_first = np.nonzero(np.r_[True, m_doc[1:] != m_doc[:-1]])[0]
    ndocs = len(d_first)
    inter = np.empty(2 * len(m_doc), dtype="<i8")
    inter[0::2] = m_start
    inter[1::2] = m_end
    byte_offs = (16 * np.r_[d_first, len(m_doc)]).astype(np.int32)
    spans = pa.Array.from_buffers(
        pa.binary(),
        ndocs,
        [None, pa.py_buffer(byte_offs.tobytes()), pa.py_buffer(inter.tobytes())],
    )
    removed = np.add.reduceat(m_end - m_start, d_first)
    return pa.table(
        {
            "doc_id": pa.array(m_doc[d_first], pa.int64()),
            "spans": spans,
            "removed_tokens": pa.array(removed, pa.int64()),
        }
    )


def _cut_batch(batch: pa.Table) -> pa.Table:
    """Apply merged token-interval removals to each affected document's
    text using original character offsets (regex \\S+ spans): untouched
    characters — including the original whitespace — survive verbatim.
    A removal cuts from the first removed token's start through the
    following token's start (swallowing the separator); a removal that
    reaches the document's end cuts back through the preceding
    separator instead, so no dangling whitespace is left. Docs with no
    removals pass through unchanged (null spans from the left-outer
    join)."""
    import re

    token_re = re.compile(r"\S+")
    texts = batch.column("text").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    removed_col = batch.column("removed_tokens").to_pylist()
    out_text, out_removed = [], []
    for t, blob, rm in zip(texts, spans_col, removed_col):
        if not blob:  # None or b"" — untouched doc
            out_text.append(t)
            out_removed.append(0)
            continue
        iv = np.frombuffer(blob, dtype="<i8")
        spans = [m.span() for m in token_re.finditer(t or "")]
        ntok = len(spans)
        pieces, cursor = [], 0
        for a, b in zip(iv[0::2], iv[1::2]):
            if b < ntok:
                cs, ce = spans[a][0], spans[b][0]
            else:
                cs = spans[a - 1][1] if a > 0 else 0
                ce = len(t)
            pieces.append(t[cursor:cs])
            cursor = ce
        pieces.append(t[cursor:])
        out_text.append("".join(pieces))
        out_removed.append(int(rm))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text": pa.array(out_text, pa.string()),
            "removed_tokens": pa.array(out_removed, pa.int64()),
        }
    )


def substring_dedup(docs: ray.data.Dataset, w: int = 50) -> ray.data.Dataset:
    """Exact substring deduplication, the ExactSubstr operator of Lee et
    al. 2022 (arXiv:2107.06499, "Deduplicating Training Data Makes
    Language Models Better"): every duplicated run of ≥ w tokens
    anywhere in the corpus keeps exactly ONE occurrence (the
    lexicographic-min (doc_id, pos)); all others are excised from their
    documents' text. Returns (doc_id, text, removed_tokens) for EVERY
    input document.

    Distributed shape (the paper builds a single-machine suffix array;
    this is the shuffle-native equivalent): one streamed pass explodes
    each doc into w-token rolling-window hashes — only those 20-byte
    rows shuffle, text never does — a sharded groupby marks every
    non-first member of each equal-hash run, a second sharded pass
    merges marks into per-doc token intervals (one list row per
    affected doc), and the tiny interval table left-outer-joins the
    corpus once for the final cut. Everything after tokenization is
    vectorized; the only per-doc Python is tokenization itself and the
    final cut over AFFECTED docs.

    Exactness caveat: windows are compared by 64-bit rolling hash, so a
    collision could excise a non-duplicate window (P ≈ n²/2⁶⁴ — for
    10¹² windows, ~3·10⁻⁵ corpus-wide); the paper's suffix array is
    collision-free but does not distribute."""
    from ..config import shuffle_width

    rows = docs.map_batches(
        _window_rows, batch_format="pyarrow", zero_copy_batch=True, fn_kwargs={"w": w}
    )
    occ = rows.groupby("shard").map_groups(_dup_occurrences, batch_format="pyarrow")

    def add_doc_shard(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "dshard", pa.array((d % SHARDS).astype(np.int32), pa.int32())
        )

    spans = (
        occ.map_batches(add_doc_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dshard")
        .map_groups(
            lambda g, w=w: _merge_spans(g.drop_columns(["dshard"]), w),
            batch_format="pyarrow",
        )
    )

    # map_groups emits zero-COLUMN blocks for empty partitions
    # (relational._collect documents this) and the hash join rejects
    # them ("no match for key field doc_id"); map_batches is skipped on
    # empty blocks so it cannot re-pin the schema. Two-part fix: union
    # ONE sentinel row under an id no document carries (doc_id = -1, a
    # LEFT outer join drops it naturally) so the spans side is never
    # row-empty even on a duplicate-free corpus — a 0-row union seed is
    # NOT enough, repartition of an all-empty dataset still loses the
    # schema — then repartition, which rebuilds blocks and clears the
    # schemaless empties. The spans table is tiny (one row per affected
    # doc), so this is not a wide exchange.
    sentinel = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()),
                "spans": pa.array([b""], pa.binary()),
                "removed_tokens": pa.array([0], pa.int64()),
            }
        )
    )
    spans = spans.union(sentinel).repartition(shuffle_width())
    joined = docs.join(
        spans,
        join_type="left_outer",
        num_partitions=shuffle_width(),
        on=("doc_id",),
    )
    return joined.map_batches(_cut_batch, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------- semantic dedup

SEM_MAX_CLUSTER = 4096


def semantic_dedup(
    embeddings: ray.data.Dataset,
    n_clusters: int = 64,
    threshold: float = 0.95,
    dim: int = 64,
    seed: int = 42,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then prune
    near-duplicates WITHIN each cluster — the clustering confines the
    quadratic cosine check to cluster-sized groups instead of the
    corpus, which is what makes semantic dedup tractable at scale.

    Plan: bounded driver-side sample → the IVF k-means (deterministic,
    k-means++ off a fixed RNG) → one map_batches pass assigns every
    vector to its nearest centroid (one batched matmul) → ONE shuffle
    groups by cluster → a greedy in-cluster prune keeps a vector iff
    its max cosine against already-kept vectors is below ``threshold``.
    Kept-first order is ascending similarity-to-centroid (the paper's
    "low" keeper policy: of a duplicate set, the vector farthest from
    the centroid survives, preserving diversity), tie-broken on vec_id
    so the result is deterministic and partition-invariant.

    Scale notes: ``n_clusters`` is the parallelism/memory knob — size
    it so N/k rows fit one reducer (the paper uses k ~ sqrt(N); at
    100 TB raise it so clusters stay ~1e4-1e5 rows). Vectors cross the
    shuffle once, as normalized float32 (half the bytes of the raw
    float64 path). Clusters above SEM_MAX_CLUSTER rows are evaluated
    on their first SEM_MAX_CLUSTER members (deterministic order) and
    the remainder is KEPT unevaluated — conservative (never drops an
    unchecked row) and logged, never silent.

    Returns one row per input vector:
    (vec_id, cluster, centroid_sim, keep).
    """
    from .similarity import IVF_ITERS, _bottomk_sample, _kmeans, _normalize

    # Partitioning-INDEPENDENT k-means sample: the shared splitmix64
    # bottom-k order-statistic draw (similarity._bottomk_sample — ONE
    # definition for the invariance-critical logic; this function used
    # to carry its own copy, review finding).
    sample = _bottomk_sample(embeddings, seed)
    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("cluster", pa.int64()),
            ("centroid_sim", pa.float64()),
            ("keep", pa.bool_()),
        ]
    )
    if not sample:
        return ray.data.from_arrow(out_schema.empty_table())
    S = _normalize(np.asarray([r["embedding"] for r in sample], dtype=np.float64))
    C = _kmeans(S, n_clusters, IVF_ITERS, seed)
    c_ref = ray.put(C.astype(np.float32))

    def assign(b: pa.Table, ref=c_ref) -> pa.Table:
        C = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if b.num_rows == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                    "vec": pa.array([], pa.list_(pa.float32(), C.shape[1])),
                }
            )
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = (
            emb.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(b.num_rows, C.shape[1])
            .astype(np.float32)
        )
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        # BLAS matmul picks the winner; sgemm blocking varies with the
        # batch SHAPE, so its values differ in the last ulp across
        # partitionings (measured). The stored sim is therefore
        # recomputed row-locally — elementwise product + fixed-length
        # float64 pairwise sum is shape-independent, so the output (and
        # the prune stage's sort order) is partition-invariant. An ulp
        # flip of argmax itself needs two centroids cosine-tied to
        # ~1e-7 — a knife-edge no real corpus sits on.
        cl = (Xn @ C.T).argmax(axis=1).astype(np.int64)
        sim = (Xn * C[cl]).sum(axis=1, dtype=np.float64)
        return pa.table(
            {
                "cluster": pa.array(cl, pa.int64()),
                "vec_id": pa.array(
                    b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "sim": pa.array(sim, pa.float64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(Xn.reshape(-1), pa.float32()), C.shape[1]
                ),
            }
        )

    def prune(group: pa.Table, threshold=threshold) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return out_schema.empty_table()
        ids = group.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
        cl = group.column("cluster").combine_chunks().to_numpy(zero_copy_only=False)
        sim = group.column("sim").combine_chunks().to_numpy(zero_copy_only=False)
        vec = group.column("vec").combine_chunks()
        d = vec.type.list_size
        X = vec.flatten().to_numpy(zero_copy_only=False).reshape(n, d)
        order = np.lexsort((ids, sim))  # ascending centroid-sim, then id
        ids, cl, sim, X = ids[order], cl[order], sim[order], X[order]
        m = min(n, SEM_MAX_CLUSTER)
        if n > SEM_MAX_CLUSTER:
            _log_truncation("semantic-dedup", n)
        keep = np.ones(n, dtype=bool)  # overflow rows stay kept
        K = np.empty((m, d), dtype=X.dtype)  # kept-vector buffer
        K[0] = X[0]
        kc = 1
        for i in range(1, m):
            if float((K[:kc] @ X[i]).max()) >= threshold:
                keep[i] = False
            else:
                K[kc] = X[i]
                kc += 1
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(cl, pa.int64()),
                "centroid_sim": pa.array(sim.astype(np.float64), pa.float64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return (
        embeddings.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


# ----------------- exact set-similarity join (AllPairs prefix filter)

def _shingle_set_rows(batch: pa.Table, k: int = 3, seed: int = 42) -> pa.Table:
    """doc → SORTED DISTINCT word-k-gram hash set as a list column.

    One polars hash pass over the flattened shingles, then a lexsort +
    boundary-keep pass dedups within docs — no per-doc Python. Empty
    docs (no words) drop out here: an empty set cannot reach any
    positive Jaccard threshold."""
    from ..functions.hashing import polars_u64
    from ..functions.minhash import shingle_batch

    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    flat, offsets = shingle_batch(texts, k)
    n = len(texts)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "size": pa.array([], pa.int64()),
            "sset": pa.array([], pa.list_(pa.int64())),
        }
    )
    if not flat:
        return empty
    h = polars_u64(pa.array(flat), seed=seed)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((h, doc_idx))
    d, hh = doc_idx[order], h[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])]
    d, hh = d[keep], hh[keep]
    sizes = np.bincount(d, minlength=n).astype(np.int64)
    nonempty = np.nonzero(sizes > 0)[0]
    if len(nonempty) == 0:
        return empty
    new_offsets = np.r_[0, np.cumsum(sizes[nonempty])]
    return pa.table(
        {
            "doc_id": pa.array(ids[nonempty], pa.int64()),
            "size": pa.array(sizes[nonempty], pa.int64()),
            "sset": pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()), pa.array(hh.view(np.int64), pa.int64())
            ),
        }
    )


def _prefix_len(sizes: np.ndarray, threshold: float) -> np.ndarray:
    """AllPairs prefix length |x| − ⌈θ|x|⌉ + 1. The ceil takes a 1e-9
    slack DOWN so a float wobble can only LENGTHEN the prefix — extra
    candidates cost a little verify work, a short prefix loses pairs."""
    return sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1


def set_similarity_join(
    docs: ray.data.Dataset, threshold: float = 0.5, k: int = 3, seed: int = 42
) -> ray.data.Dataset:
    """EXACT word-k-gram-set Jaccard self-join: every unordered pair
    with J ≥ threshold, no false negatives — the completeness guarantee
    the MinHash family trades away (prefix-filter / AllPairs plan:
    Bayardo, Ma & Srikant, WWW'07 — public algorithm).

    Plan (set elements = u64 shingle hashes; text never re-enters after
    the first pass):
      1. docs → (doc_id, size, sorted-distinct hash set) — materialized
         ONCE because three consumers branch from it (Ray re-executes
         lazy branches per consumer); ~8 B/token ≪ the text it replaces.
      2. token df: explode + per-batch combiner + grouped Sum.
      3. prefix tokens: df joins back on token (no driver broadcast —
         the df table is corpus-vocabulary-scale), docs shard on
         doc_id % SHARDS, ONE vectorized pass per shard sorts each
         doc's tokens by (df, token) and keeps the first
         |x| − ⌈θ|x|⌉ + 1 — the rarest-first prefix.
      4. candidates: prefix rows shard on token % SHARDS, equal-token
         runs pair up under the size filter θ·max ≤ min (MAX_BUCKET cap
         logged like every LSH bucket).
      5. verify: the tiny pair list role-explodes, joins the hash sets
         back ONCE, and an exact sorted-merge intersection computes
         J = |∩| / (|a|+|b|−|∩|); J ≥ θ is the only emitted filter.

    Ties in the df order break on the token hash — the order just has
    to be SHARED, any total order keeps the prefix theorem valid."""
    from ray.data.aggregate import Sum

    from ..config import shuffle_width

    sets = docs.map_batches(
        _shingle_set_rows,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"k": k, "seed": seed},
    ).materialize()

    def explode(b: pa.Table) -> pa.Table:
        s = b.column("sset")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        counts = np.diff(s.offsets.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(b.column("doc_id").to_numpy(zero_copy_only=False), counts),
                    pa.int64(),
                ),
                "size": pa.array(
                    np.repeat(b.column("size").to_numpy(zero_copy_only=False), counts),
                    pa.int64(),
                ),
                "token": s.flatten(),
            }
        )

    exploded = sets.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "df"])

    df = (
        exploded.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    # zero-column-block guard on df (the join's right side): its hash-
    # partition count equals the upstream block count, and a partition
    # with no tokens emits a schemaless block the join rejects. The
    # vocabulary table is the same magnitude as the already-materialized
    # `sets` (≤16 B per distinct shingle), so one repartition +
    # materialize is within the plan's existing memory budget; the
    # count() early-exit covers the no-shingles corpus (all docs shorter
    # than k words), where repartition cannot restore the schema.
    df = df.repartition(shuffle_width()).materialize()
    if df.count() == 0:
        return ray.data.from_arrow(_pairs_schema("jaccard").empty_table())
    with_df = exploded.join(
        df, join_type="inner", num_partitions=shuffle_width(), on=("token",)
    )

    def shard_doc(b: pa.Table) -> pa.Table:
        return b.append_column(
            "shard",
            pa.array(
                (b.column("doc_id").to_numpy(zero_copy_only=False) % SHARDS).astype(
                    np.int32
                ),
                pa.int32(),
            ),
        )

    def prefix_rows(group: pa.Table, threshold=threshold) -> pa.Table:
        out_schema = pa.schema(
            [("tshard", pa.int32()), ("token", pa.int64()),
             ("doc_id", pa.int64()), ("size", pa.int64())]
        )
        if group.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        tok = group.column("token").to_numpy(zero_copy_only=False)
        size = group.column("size").to_numpy(zero_copy_only=False)
        dfv = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, dfv, did))
        did, tok, size = did[order], tok[order], size[order]
        starts, ends = _key_runs(did)
        pos = np.arange(len(did), dtype=np.int64) - np.repeat(starts, ends - starts)
        plen = _prefix_len(size, threshold)
        keep = pos < plen
        return pa.table(
            {
                "tshard": pa.array(
                    (tok[keep].view(np.uint64) % np.uint64(SHARDS)).astype(np.int32),
                    pa.int32(),
                ),
                "token": pa.array(tok[keep], pa.int64()),
                "doc_id": pa.array(did[keep], pa.int64()),
                "size": pa.array(size[keep], pa.int64()),
            }
        )

    prefixes = (
        with_df.map_batches(shard_doc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(prefix_rows, batch_format="pyarrow")
    )

    def shard_cands(group: pa.Table, threshold=threshold) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        tok = group.column("token").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        size = group.column("size").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, tok))
        tok, did, size = tok[order], did[order], size[order]
        a_out: list[int] = []
        b_out: list[int] = []
        for s, e in zip(*_key_runs(tok)):
            if e - s < 2:
                continue
            if e - s > MAX_BUCKET:
                _log_truncation("setjoin", int(e - s))
            ids_b = did[s:e][:MAX_BUCKET]
            sz_b = size[s:e][:MAX_BUCKET]
            m = len(ids_b)
            for i in range(m - 1):
                lo = np.minimum(sz_b[i + 1 :], sz_b[i])
                hi = np.maximum(sz_b[i + 1 :], sz_b[i])
                ok = np.nonzero((lo >= threshold * hi) & (ids_b[i + 1 :] != ids_b[i]))[0]
                for j in ok:
                    a, b = int(ids_b[i]), int(ids_b[i + 1 + j])
                    a_out.append(min(a, b))
                    b_out.append(max(a, b))
        return pa.table(
            {"doc_a": pa.array(a_out, pa.int64()), "doc_b": pa.array(b_out, pa.int64())}
        )

    cands = (
        prefixes.groupby("tshard")
        .map_groups(shard_cands, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("doc_a", alias_name="_n"))
        .select_columns(["doc_a", "doc_b"])
        # zero-column-block guard + all-empty early exit: see
        # ngram_jaccard_pairs — candidate-pair cardinality can be far
        # below the aggregate's hash-partition count (= upstream block
        # count), and the set join below rejects schemaless blocks.
        .repartition(shuffle_width())
        .materialize()
    )
    if cands.count() == 0:
        return ray.data.from_arrow(_pairs_schema("jaccard").empty_table())

    def explode_roles(b: pa.Table) -> pa.Table:
        def arr(col):
            c = b.column(col)
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        a, bb = arr("doc_a"), arr("doc_b")
        return pa.table(
            {
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([bb, bb]),
                "role": pa.array([0] * b.num_rows + [1] * b.num_rows, pa.int8()),
                "key": pa.concat_arrays([a, bb]),
            }
        )

    roles = cands.map_batches(explode_roles, batch_format="pyarrow", zero_copy_batch=True)

    # Acero hash joins reject list<> payload columns — pack each sorted
    # hash set into one binary cell for the ride through the join (the
    # substring-dedup excision-span trick), unpack with np.frombuffer.
    def pack_sets(b: pa.Table) -> pa.Table:
        s = b.column("sset")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        vals = s.flatten().to_numpy(zero_copy_only=False)
        offs = s.offsets.to_numpy(zero_copy_only=False)
        base = offs[0]
        packed = [vals[a - base : z - base].tobytes() for a, z in zip(offs[:-1], offs[1:])]
        return pa.table(
            {"doc_id": b.column("doc_id"), "packed": pa.array(packed, pa.binary())}
        )

    packed_sets = sets.map_batches(pack_sets, batch_format="pyarrow", zero_copy_batch=True)
    joined = roles.join(
        packed_sets,
        join_type="inner",
        num_partitions=shuffle_width(),
        on=("key",),
        right_on=("doc_id",),
    )

    def verify_pair(group: pa.Table, threshold=threshold) -> pa.Table:
        empty = pa.Table.from_pylist([], schema=_pairs_schema("jaccard"))
        role = group.column("role").to_numpy(zero_copy_only=False)
        i_a = np.nonzero(role == 0)[0]
        i_b = np.nonzero(role == 1)[0]
        if not len(i_a) or not len(i_b):
            return empty
        s = group.column("packed")
        sa = np.frombuffer(s[int(i_a[0])].as_py(), dtype=np.int64)
        sb = np.frombuffer(s[int(i_b[0])].as_py(), dtype=np.int64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j < threshold:
            return empty
        return pa.table(
            {
                "doc_a": group.column("doc_a").take(pa.array(i_a[:1])),
                "doc_b": group.column("doc_b").take(pa.array(i_b[:1])),
                "jaccard": pa.array([j], pa.float64()),
            }
        )

    return joined.groupby(["doc_a", "doc_b"]).map_groups(
        verify_pair, batch_format="pyarrow", fn_kwargs={"threshold": threshold}
    )
