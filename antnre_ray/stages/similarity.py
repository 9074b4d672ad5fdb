"""Similarity search over an embedding column (SURVEY.md B28 + scale path).

Two plans:
- brute-force cosine top-k (pipelines/relational.py b28_knn): broadcast
  query matrix, one numpy matmul per batch, exact — the baseline.
- LSH-bucketed ANN (here): random-hyperplane signatures bucket the table
  rows; only rows sharing a bucket with some query are scored. At scale
  this touches |buckets hit| instead of |table| rows — the approximate
  path. Recall is tested against brute force (tests/test_extras.py).
"""

from __future__ import annotations

import os

import uuid

import numpy as np
import pyarrow as pa

import ray
import ray.data

# ANN regime: neighbors at cosine ~0.3–0.9 → FEW planes (wide buckets),
# MANY tables. Contrast stages/dedup.py (near-dup regime, cos ≥ 0.95 →
# 12 planes suffice). On unstructured (near-random) embeddings LSH recall
# is intrinsically bounded — clustered data is the design target; the
# recall test uses clustered fixtures and the random driver table gets a
# run-only check.
N_PLANES = 6
N_TABLES = 8


def _hyperplanes(dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed ^ 0xA55)
    return rng.standard_normal((N_TABLES, N_PLANES, dim)).astype(np.float64)


def _normalize(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def ann_lsh_topk(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: (query_id, neighbor_id, rank) per query.

    Each batch scores only the (row, query) combinations that collide in
    at least one hash table; per-batch partial top-ks merge driver-side
    (k·|queries| rows — tiny).
    """
    planes = _hyperplanes(dim, seed)
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    qkeys = np.zeros((len(query_ids), N_TABLES), dtype=np.int64)
    pw = np.int64(1) << np.arange(N_PLANES, dtype=np.int64)
    for t in range(N_TABLES):
        qkeys[:, t] = (((Qn @ planes[t].T) > 0).astype(np.int64) * pw[None, :]).sum(axis=1)
    state_ref = ray.put((query_ids, Qn, qkeys))

    def score(b: pa.Table, ref=state_ref, k=k) -> pa.Table:
        qids, Qn, qkeys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        planes_l = _hyperplanes(dim, seed)
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim).astype(np.float64)
        Xn = _normalize(X)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        rkeys = np.zeros((len(ids), N_TABLES), dtype=np.int64)
        for t in range(N_TABLES):
            rkeys[:, t] = (((Xn @ planes_l[t].T) > 0).astype(np.int64) * pw[None, :]).sum(axis=1)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            collide = (rkeys == qkeys[qi][None, :]).any(axis=1) & (ids != qid)
            cand = np.nonzero(collide)[0]
            if len(cand) == 0:
                continue
            cos = Xn[cand] @ Qn[qi]
            top = cand[np.lexsort((ids[cand], -cos))][:k]
            out_q += [qid] * len(top)
            out_n += ids[top].tolist()
            out_c += (Xn[top] @ Qn[qi]).tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = pa.concat_tables(
        [ray.get(r) for r in embeddings.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()]
    )
    return _merge_topk(partials, k)


# ------------------------------------------ persisted bucket-partitioned index

def _bucket_name(t: int, key: int) -> str:
    return f"t{t}k{key}"


def _merge_topk(partials: pa.Table, k: int) -> pa.Table:
    """Driver-side exact merge of per-batch top-k partials (k·|queries|
    rows — tiny). Dedups (query, neighbor) pairs that collided in more
    than one bucket; rank ties pinned by neighbor_id."""
    d = partials.to_pydict()
    by_q: dict[int, dict[int, float]] = {}
    for qid, nid, cos in zip(d["query_id"], d["neighbor_id"], d["cos"]):
        by_q.setdefault(qid, {})[nid] = cos
    rows = []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid].items(), key=lambda t: (-t[1], t[0]))[:k]
        for rank, (nid, _) in enumerate(cands, start=1):
            rows.append({"query_id": qid, "neighbor_id": nid, "rank": rank})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
    )


def _routed_scorer(state_ref, bucket_col: str, k: int, prep, score_fn):
    """THE routing/self-exclusion/tie-break shell every persisted-index
    scorer shares (hyperplane buckets, IVF inverted lists, IVF-PQ ADC):
    for each bucket value present in the batch, score its rows against
    exactly the queries that hashed/probed into it — self-matches
    excluded, ties broken by neighbor id. One implementation so those
    rules cannot drift between index types; only the feature extraction
    (``prep(state, batch) -> features``) and the per-candidate scoring
    (``score_fn(state, features, cand, qi, bucket) -> scores``) vary."""

    def score(b: pa.Table, ref=state_ref, k=k) -> pa.Table:
        state = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        qids, bucket_to_qis = state[0], state[-1]
        feats = prep(state, b)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        buckets = b.column(bucket_col).to_pylist()
        by_bucket: dict = {}
        for i, v in enumerate(buckets):
            by_bucket.setdefault(v, []).append(i)
        out_q, out_n, out_c = [], [], []
        for v, rows in by_bucket.items():
            qis = bucket_to_qis.get(v)
            if not qis:
                continue
            in_b = np.asarray(rows)
            for qi in qis:
                qid = qids[qi]
                cand = in_b[ids[in_b] != qid]
                if len(cand) == 0:
                    continue
                s = score_fn(state, feats, cand, qi, v)
                order = np.lexsort((ids[cand], -s))[:k]
                top = cand[order]
                out_q += [qid] * len(top)
                out_n += ids[top].tolist()
                out_c += s[order].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    return score


def _bucketed_scorer(state_ref, bucket_col: str, dim: int, k: int):
    """Exact-cosine scorer over stored raw vectors (hyperplane + IVF
    indexes), as a _routed_scorer instantiation. State tuple:
    (query_ids, Qn, bucket_to_qis)."""

    def prep(state, b: pa.Table) -> np.ndarray:
        vec = b.column("vec")
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        X = vec.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim)
        return _normalize(X.astype(np.float64))

    def score_fn(state, Xn, cand, qi, _bucket) -> np.ndarray:
        _qids, Qn, _routing = state
        return Xn[cand] @ Qn[qi]

    return _routed_scorer(state_ref, bucket_col, k, prep, score_fn)


def _empty_topk(k: int) -> pa.Table:
    return _merge_topk(
        pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        ),
        k,
    )


def _scored_partials(ds: ray.data.Dataset, score, k: int = 64) -> pa.Table:
    """Collect per-batch (query_id, neighbor_id, cos) partials with one
    bounding merge level: each of 16 partitions keeps only its per-query
    top-k DISTINCT candidates (global winners are inside every covering
    partition's top-k — exact), so the driver holds ≤ 16·k·|queries|
    rows however many blocks the index scan produced.

    The dedup before truncation matters: the hyperplane index stores a
    vector once per LSH table, so one (query, neighbor) pair can reach
    a partition up to N_TABLES times with identical cos — counting the
    copies toward the cap could evict a true top-k neighbor (review
    finding; latent at the tested k=5, real at k > 8)."""

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        q = b.column("query_id").to_numpy(zero_copy_only=False)
        nid = b.column("neighbor_id").to_numpy(zero_copy_only=False)
        cos = b.column("cos").to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, -cos, q))
        qs, ns = q[order], nid[order]
        # drop duplicate (query, neighbor) rows (equal cos by
        # construction — same stored vector, same query)
        first = np.r_[True, (qs[1:] != qs[:-1]) | (ns[1:] != ns[:-1])]
        order, qs = order[first], qs[first]
        starts = np.nonzero(np.r_[True, qs[1:] != qs[:-1]])[0]
        pos = np.arange(len(qs)) - np.repeat(starts, np.diff(np.r_[starts, len(qs)]))
        keep = order[pos < k]
        return b.take(pa.array(np.sort(keep)))

    return pa.concat_tables(
        [
            ray.get(r)
            for r in ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(16)
            .map_batches(partial_topk, batch_size=None, batch_format="pyarrow")
            .to_arrow_refs()
        ]
    )


def build_ann_index(
    embeddings: ray.data.Dataset,
    index_path: str,
    dim: int = 64,
    seed: int = 42,
    overwrite: bool = False,
) -> str:
    """Build a PERSISTED bucket-partitioned ANN index (B28 scale path).

    Each row lands in its N_TABLES LSH buckets; the exploded rows are
    written as Parquet partitioned by bucket (one directory per bucket,
    via the storage facade's format). A repeated-query workload then
    reads ONLY the hit-bucket directories instead of re-scanning the
    whole table per query set (round-1 gap: scan-per-query ANN).
    Raw float32 vectors are stored, so query-side scores bit-match the
    scan-based :func:`ann_lsh_topk` plan. Idempotent: a committed
    manifest skips rebuilds (resumable-output rule).

    DEPLOYMENT: BOTH sides are URI-capable. Shards are written under a
    fresh ``<index>/<build-id>/`` directory on the target filesystem
    (any ``pyarrow.fs`` URI — s3://…, hdfs://…, or a local/NFS path),
    then a single ``_manifest.json`` write publishes them atomically
    (``_commit_index_build``) — no rename anywhere, so plain object
    stores work; a crashed build leaves only invisible orphan files.
    Queries resolve shards through the manifest (``_shard_files``),
    never by directory listing.
    """
    if _index_is_built(index_path) and not overwrite:
        return index_path
    planes = _hyperplanes(dim, seed)
    pw = np.int64(1) << np.arange(N_PLANES, dtype=np.int64)
    build_id = f"build-{uuid.uuid4().hex[:8]}"
    filesystem, root = _index_filesystem(index_path)
    build_root = f"{root.rstrip('/')}/{build_id}"

    def rows(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim).astype(np.float32)
        Xn = _normalize(X.astype(np.float64))
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        outs = []
        for t in range(N_TABLES):
            keys = (((Xn @ planes[t].T) > 0).astype(np.int64) * pw[None, :]).sum(axis=1)
            names = pa.array([_bucket_name(t, int(kk)) for kk in keys], pa.string())
            outs.append(
                pa.table(
                    {
                        # 'bucket' becomes the hive partition path; 'bkt'
                        # stays IN the file (reads of explicit file lists
                        # don't re-infer hive columns).
                        "bucket": names,
                        "bkt": names,
                        "vec_id": pa.array(ids, pa.int64()),
                        "vec": pa.FixedSizeListArray.from_arrays(
                            pa.array(X.reshape(-1), pa.float32()), dim
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    # Write-then-manifest-commit: shards land under a fresh build dir
    # on the TARGET filesystem; the manifest write (last) publishes
    # them atomically, so a previous/crashed build can never mix stale
    # bucket files into query results — and no rename is needed.
    embeddings.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        build_root, filesystem=filesystem, partition_cols=["bucket"]
    )
    _commit_index_build(index_path, build_id, {})
    return index_path


def _index_filesystem(index_path: str) -> tuple[object, str]:
    """(filesystem, fs-native root) for a local path or any
    Arrow-filesystem URI (s3://…, hdfs://…)."""
    from pyarrow import fs as pafs

    if "://" in index_path:
        return pafs.FileSystem.from_uri(index_path)
    # plain (possibly relative) local path — from_uri rejects those
    return pafs.LocalFileSystem(), os.path.abspath(index_path)


def _load_manifest(index_path: str) -> dict | None:
    """The committed manifest, or None if the index has none (never
    built, build in flight, or a legacy rename-committed layout)."""
    import json

    from pyarrow import fs as pafs

    filesystem, root = _index_filesystem(index_path)
    p = f"{root.rstrip('/')}/_manifest.json"
    try:
        info = filesystem.get_file_info(p)
    except OSError:
        return None
    if info.type != pafs.FileType.File:
        return None
    with filesystem.open_input_stream(p) as f:
        return json.loads(f.read().decode())


def _index_is_built(index_path: str) -> bool:
    if _load_manifest(index_path) is not None:
        return True
    return os.path.exists(os.path.join(index_path, "_built"))  # legacy layout


def _write_npy(filesystem, path: str, arr: np.ndarray) -> None:
    import io

    buf = io.BytesIO()
    np.save(buf, arr)
    with filesystem.open_output_stream(path) as f:
        f.write(buf.getvalue())


def _read_npy(filesystem, path: str) -> np.ndarray:
    import io

    with filesystem.open_input_stream(path) as f:
        return np.load(io.BytesIO(f.read()))


def _load_index_array(index_path: str, name: str) -> np.ndarray:
    """Read centroids.npy / codebooks.npy through the manifest (URI-
    capable); fall back to the legacy flat layout."""
    man = _load_manifest(index_path)
    filesystem, root = _index_filesystem(index_path)
    if man is not None:
        return _read_npy(filesystem, f"{root.rstrip('/')}/{man['build']}/{name}")
    return np.load(os.path.join(index_path, name))


def _commit_index_build(index_path: str, build_id: str, arrays: dict) -> None:
    """MANIFEST-FILE commit (VERDICT r3 #4): shards were already
    written under ``<index>/<build_id>/`` via the target filesystem; we
    (1) write the sidecar arrays there, (2) enumerate the build's
    parquet shards, and (3) write ``_manifest.json`` at the index root
    LAST — a single-file PUT, atomic on object stores, so a crashed
    build leaves the previous manifest (and the previous index) fully
    readable and an uncommitted pile of orphan files. Queries resolve
    shards THROUGH the manifest, never by directory listing, so no
    rename-capable filesystem is required anywhere in the build path.
    Superseded builds are garbage-collected with a ONE-REBUILD grace
    period rather than eagerly: the manifest records the build it
    replaced (``prev``), and each commit deletes only the
    GRAND-previous build (``prev.prev``). A reader that resolved the
    old manifest just before a concurrent overwrite rebuild can still
    finish against the old shards — they survive until the NEXT
    rebuild — while storage stays bounded at two builds (current +
    graced). Clock-free, so it needs no timestamp agreement between
    builders on different nodes; a crash mid-delete only leaks
    storage."""
    import json

    from pyarrow import fs as pafs

    filesystem, root = _index_filesystem(index_path)
    root = root.rstrip("/")
    build_root = f"{root}/{build_id}"
    filesystem.create_dir(build_root, recursive=True)
    for name, arr in arrays.items():
        _write_npy(filesystem, f"{build_root}/{name}", arr)
    sel = pafs.FileSelector(build_root, recursive=True, allow_not_found=True)
    rel = sorted(
        i.path[len(build_root) + 1 :]
        for i in filesystem.get_file_info(sel)
        if i.is_file and i.path.endswith(".parquet")
    )
    prev = _load_manifest(index_path)
    prev_build = prev.get("build") if prev is not None else None
    manifest = {"build": build_id, "files": rel}
    if prev_build and prev_build != build_id:
        manifest["prev"] = prev_build
    with filesystem.open_output_stream(f"{root}/_manifest.json") as f:
        f.write(json.dumps(manifest).encode())
    # grace-period GC: only the build superseded TWO commits ago goes
    grand = prev.get("prev") if prev is not None else None
    if grand and grand != build_id and grand != prev_build:
        try:
            filesystem.delete_dir(f"{root}/{grand}")
        except OSError:
            pass


def _shard_files(index_path: str, subdirs: list[str]) -> tuple[list[str], object]:
    """Resolve the parquet shards of the given partition directories.

    Manifest-committed indexes (the only kind this module now builds)
    resolve through ``_manifest.json`` — no directory listing at all,
    so query-side ``index_path`` may be any Arrow-filesystem URI and
    uncommitted/orphaned build files are invisible. Legacy layouts
    (rename-committed, pre-manifest) fall back to a ``pyarrow.fs``
    directory scan. Returns (fs-native shard paths, filesystem) for
    ``ray.data.read_parquet(..., filesystem=...)``; missing partitions
    contribute no files; order is sorted (deterministic merge order)."""
    from pyarrow import fs as pafs

    filesystem, root = _index_filesystem(index_path)
    root = root.rstrip("/")
    man = _load_manifest(index_path)
    if man is not None:
        want = set(subdirs)
        build_root = f"{root}/{man['build']}"
        return (
            sorted(f"{build_root}/{r}" for r in man["files"] if r.split("/")[0] in want),
            filesystem,
        )
    files: list[str] = []
    for d in subdirs:
        sel = pafs.FileSelector(f"{root}/{d}", allow_not_found=True)
        infos = filesystem.get_file_info(sel)
        files.extend(
            sorted(i.path for i in infos if i.is_file and i.path.endswith(".parquet"))
        )
    return files, filesystem


def query_ann_index(
    index_path: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
    seed: int = 42,
) -> pa.Table:
    """Top-k against a persisted index: touches ONLY hit buckets.

    Reads the ≤ |queries|·N_TABLES bucket directories the query keys
    select (column-pruned), scores each bucket's rows against exactly
    the queries that hashed into it, and merges per-batch partials
    driver-side. Output schema matches :func:`ann_lsh_topk`; with the
    same (dim, seed) the results are identical to the scan plan.
    """
    import os

    planes = _hyperplanes(dim, seed)
    pw = np.int64(1) << np.arange(N_PLANES, dtype=np.int64)
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    bucket_to_qis: dict[str, list[int]] = {}
    for t in range(N_TABLES):
        keys = (((Qn @ planes[t].T) > 0).astype(np.int64) * pw[None, :]).sum(axis=1)
        for qi, kk in enumerate(keys):
            bucket_to_qis.setdefault(_bucket_name(t, int(kk)), []).append(qi)
    files, filesystem = _shard_files(
        index_path, [f"bucket={name}" for name in sorted(bucket_to_qis)]
    )
    if not files:
        return _empty_topk(k)
    ds = ray.data.read_parquet(files, filesystem=filesystem, columns=["vec_id", "vec", "bkt"])
    state_ref = ray.put((query_ids, Qn, bucket_to_qis))
    partials = _scored_partials(ds, _bucketed_scorer(state_ref, "bkt", dim, k), k=max(k, 64))
    return _merge_topk(partials, k)


# ------------------------------------------------- IVF (coarse-quantizer) index

IVF_CENTROIDS = 64
IVF_SAMPLE = 4096
IVF_ITERS = 10


def _bottomk_sample(
    embeddings: ray.data.Dataset, seed: int, k: int = IVF_SAMPLE
) -> list[dict]:
    """Partitioning-INDEPENDENT uniform sample for index training, in
    ONE pass with no count(): the min(N, k) rows with the smallest
    splitmix64(vec_id) are a uniform draw (the KMV order-statistic
    trick — semantic_dedup's fix, dedup.py). Dataset.random_sample
    draws per-block, so the same corpus at a different block layout
    yielded DIFFERENT training sets and therefore different centroids
    for the "same" index (VERDICT r3 #3). Each batch contributes a
    ≤ k-row combiner partial; the driver keeps the global bottom-k by
    (hash, vec_id)."""
    from ..functions.hashing import mix64

    def draw(b: pa.Table, seed=seed) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("_h", pa.array([], pa.int64()))
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix64(ids, seed=seed).view(np.int64) ^ np.int64(-(2**63))  # order-preserving
        t = b.append_column("_h", pa.array(h, pa.int64()))
        if b.num_rows <= k:
            return t
        keep = np.argpartition(h, k)[:k]
        return t.take(pa.array(np.sort(keep)))

    def bottomk_merge(b: pa.Table) -> pa.Table:
        """tree-level merge: the global bottom-k is inside every
        covering partition's bottom-k (exact)."""
        if b.num_rows <= k:
            return b
        import numpy as _np

        h = b.column("_h").to_numpy(zero_copy_only=False)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        order = _np.lexsort((ids, h))[:k]
        return b.take(pa.array(_np.sort(order)))

    rows = (
        embeddings.map_batches(draw, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(16)
        .map_batches(bottomk_merge, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (r["_h"], r["vec_id"]))
    return rows[:k]


def _kmeans(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic numpy k-means (k-means++ init off a fixed RNG).
    Runs driver-side on a SAMPLE only — centroids are k×dim floats."""
    rng = np.random.default_rng(seed ^ 0x1F1F)
    n = len(X)
    k = min(k, n)
    # k-means++ seeding
    cents = [X[rng.integers(n)]]
    d2 = np.full(n, np.inf)
    for _ in range(1, k):
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents.append(X[rng.choice(n, p=probs)])
    C = np.stack(cents)
    for _ in range(iters):
        # assign to nearest centroid (squared L2 == cosine order on unit vectors)
        assign = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def build_ivf_index(
    embeddings: ray.data.Dataset,
    index_path: str,
    dim: int = 64,
    seed: int = 42,
    n_centroids: int = IVF_CENTROIDS,
    overwrite: bool = False,
) -> str:
    """IVF index: k-means centroids from a driver-side SAMPLE (tiny),
    then every row assigned to its nearest centroid in one distributed
    pass and written parquet-partitioned by centroid id. The inverted
    lists give a tunable recall/latency dial (``nprobe``) that the
    hyperplane-LSH index lacks; both share the read-only-hit-buckets
    query plan. Raw float32 vectors stored; idempotent via the
    committed manifest. Same manifest-commit deployment story as
    :func:`build_ann_index` (URI-capable, no rename)."""
    if _index_is_built(index_path) and not overwrite:
        return index_path
    build_id = f"build-{uuid.uuid4().hex[:8]}"
    filesystem, root = _index_filesystem(index_path)
    build_root = f"{root.rstrip('/')}/{build_id}"
    # Partition-invariant bottom-k-by-hash draw (one pass, no count).
    sample = _bottomk_sample(embeddings, seed)
    if not sample:
        # Empty table → empty (but valid) index: zero centroids, no lists.
        _commit_index_build(index_path, build_id, {"centroids.npy": np.zeros((0, dim))})
        return index_path
    S = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    Sn = _normalize(S)
    C = _kmeans(Sn, n_centroids, IVF_ITERS, seed)
    c_ref = ray.put(C)

    def assign(b: pa.Table, ref=c_ref) -> pa.Table:
        C = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim).astype(np.float32)
        Xn = _normalize(X.astype(np.float64))
        cid = (Xn @ C.T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {
                "centroid": pa.array([f"c{c:04d}" for c in cid], pa.string()),
                "cid": pa.array(cid, pa.int32()),
                "vec_id": b.column("vec_id"),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1), pa.float32()), dim),
            }
        )

    embeddings.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        build_root, filesystem=filesystem, partition_cols=["centroid"]
    )
    _commit_index_build(index_path, build_id, {"centroids.npy": C})
    return index_path


def query_ivf_index(
    index_path: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 8,
    dim: int = 64,
) -> pa.Table:
    """Top-k against the IVF index: each query probes its ``nprobe``
    nearest centroids' lists only. Reads are pruned to the probed
    partitions; per-batch partial top-ks merge driver-side."""
    C = _load_index_array(index_path, "centroids.npy")
    if len(C) == 0:
        return _empty_topk(k)
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    sims = Qn @ C.T  # [q, k_cent]
    probe = np.argsort(-sims, axis=1)[:, :nprobe]  # [q, nprobe]
    cid_to_qis: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for c in probe[qi]:
            cid_to_qis.setdefault(int(c), []).append(qi)
    files, filesystem = _shard_files(
        index_path, [f"centroid=c{c:04d}" for c in sorted(cid_to_qis)]
    )
    if not files:
        return _empty_topk(k)
    ds = ray.data.read_parquet(files, filesystem=filesystem, columns=["vec_id", "vec", "cid"])
    state_ref = ray.put((query_ids, Qn, cid_to_qis))
    partials = _scored_partials(ds, _bucketed_scorer(state_ref, "cid", dim, k), k=max(k, 64))
    return _merge_topk(partials, k)


def brute_force_topk(
    embeddings: ray.data.Dataset, queries: np.ndarray, query_ids: list[int], k: int = 5, dim: int = 64
) -> pa.Table:
    """Exact reference for recall measurement (same output schema)."""
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((query_ids, Qn))

    def score(b: pa.Table, ref=ref, k=k) -> pa.Table:
        qids, Qn = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim).astype(np.float64)
        Xn = _normalize(X)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        cos = Xn @ Qn.T
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            top = cand[np.lexsort((ids[cand], -cos[cand, qi]))][:k]
            out_q += [qid] * len(top)
            out_n += ids[top].tolist()
            out_c += cos[top, qi].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = pa.concat_tables(
        [ray.get(r) for r in embeddings.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()]
    )
    return _merge_topk(partials, k)


# ----------------------- IVF-PQ (product-quantized inverted lists)

PQ_M = 8  # subspaces (dim must divide evenly)
PQ_K = 256  # codes per subspace → one uint8 per subspace per vector
PQ_TRAIN_ITERS = 8


def build_ivfpq_index(
    embeddings: ray.data.Dataset,
    index_path: str,
    dim: int = 64,
    seed: int = 42,
    n_centroids: int = IVF_CENTROIDS,
    m: int = PQ_M,
    overwrite: bool = False,
) -> str:
    """IVF-PQ: the 100-TB vector-index form (Jégou et al. 2011,
    "Product quantization for nearest neighbor search"). The IVF coarse
    quantizer routes each vector to an inverted list, then the vector's
    RESIDUAL (x − centroid) is product-quantized: split into ``m``
    subspaces, each encoded as the id of its nearest entry in a
    256-entry per-subspace codebook — so a float32[64] vector (256 B)
    stores as ``m`` uint8 codes (8 B, 32× compression) and a billion
    vectors fit where raw floats never would. Training (coarse k-means
    + per-subspace residual k-means) runs driver-side on the same
    bounded sample as the IVF build; encoding is one distributed pass
    (per batch: one matmul per subspace via the ‖r−c‖² = ‖r‖²−2r·c+‖c‖²
    expansion, never an n×256×d temp). Same deployment constraint and
    manifest-commit build as :func:`build_ann_index`."""
    if dim % m != 0:
        raise ValueError(f"PQ needs dim divisible by m, got dim={dim}, m={m}")
    sub = dim // m
    if _index_is_built(index_path) and not overwrite:
        return index_path
    build_id = f"build-{uuid.uuid4().hex[:8]}"
    filesystem, root = _index_filesystem(index_path)
    build_root = f"{root.rstrip('/')}/{build_id}"

    # Partition-invariant bottom-k-by-hash draw (one pass, no count).
    sample = _bottomk_sample(embeddings, seed)
    if not sample:
        _commit_index_build(
            index_path,
            build_id,
            {
                "centroids.npy": np.zeros((0, dim)),
                "codebooks.npy": np.zeros((m, PQ_K, sub)),
            },
        )
        return index_path

    S = _normalize(np.asarray([r["embedding"] for r in sample], dtype=np.float64))
    C = _kmeans(S, n_centroids, IVF_ITERS, seed)
    R = S - C[(S @ C.T).argmax(axis=1)]  # training residuals
    codebooks = np.stack(
        [
            # residual slices are NOT unit vectors: k-means here must not
            # re-normalize, so run it on the raw slice and keep the raw
            # mean — _kmeans normalizes, hence a local loop.
            _kmeans_raw(R[:, j * sub : (j + 1) * sub], PQ_K, PQ_TRAIN_ITERS, seed + j)
            for j in range(m)
        ]
    )  # (m, PQ_K, sub)
    state = ray.put((C, codebooks))

    def encode(b: pa.Table, ref=state) -> pa.Table:
        C, CB = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim)
        Xn = _normalize(X.astype(np.float64))
        cid = (Xn @ C.T).argmax(axis=1).astype(np.int32)
        R = Xn - C[cid]
        codes = np.empty((b.num_rows, m), dtype=np.uint8)
        for j in range(m):
            r = R[:, j * sub : (j + 1) * sub]
            cb = CB[j]
            # argmin ‖r−c‖² = argmin(‖c‖² − 2 r·c): one (n×256) matmul.
            codes[:, j] = ((cb * cb).sum(axis=1)[None, :] - 2.0 * (r @ cb.T)).argmin(axis=1)
        return pa.table(
            {
                "centroid": pa.array([f"c{c:04d}" for c in cid], pa.string()),
                "cid": pa.array(cid, pa.int32()),
                "vec_id": b.column("vec_id"),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), m
                ),
            }
        )

    embeddings.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        build_root, filesystem=filesystem, partition_cols=["centroid"]
    )
    _commit_index_build(
        index_path, build_id, {"centroids.npy": C, "codebooks.npy": codebooks}
    )
    return index_path


def _kmeans_raw(X: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """k-means WITHOUT the unit-sphere projection (_kmeans normalizes
    its centroids — right for coarse quantizers on unit vectors, wrong
    for PQ residual slices, which live near the origin)."""
    rng = np.random.default_rng(seed ^ 0x9E37)
    n = len(X)
    k = min(k, n)
    cents = [X[rng.integers(n)]]
    d2 = np.full(n, np.inf)
    for _ in range(1, k):
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(axis=1))
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents.append(X[rng.choice(n, p=probs)])
    C = np.stack(cents)
    for _ in range(iters):
        assign = ((X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]).argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    return C


def query_ivfpq_index(
    index_path: str,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 8,
    dim: int = 64,
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k against the IVF-PQ index: the
    query stays a full float vector, stored vectors stay codes. Per
    query ONE (m × 256) lookup table LUT[j][c] = q_j · codebook[j][c]
    turns each candidate's score into base[cid] + Σ_j LUT[j][codes_j] —
    a table gather per row, no float vectors read from storage at all.
    Reads touch only the nprobe probed partitions (codes column, 8 B a
    row). Scores are approximations of cosine (quantization error), so
    recall is the tested contract, exactness is not."""
    C = _load_index_array(index_path, "centroids.npy")
    CB = _load_index_array(index_path, "codebooks.npy")  # (m, 256, sub)
    if len(C) == 0:
        return _empty_topk(k)
    m, _, sub = CB.shape
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    base = Qn @ C.T  # [q, n_cent] — the coarse part of every score
    probe = np.argsort(-base, axis=1)[:, :nprobe]
    luts = np.einsum("qjs,jks->qjk", Qn.reshape(len(Qn), m, sub), CB)  # [q, m, 256]
    cid_to_qis: dict[int, list[int]] = {}
    for qi in range(len(query_ids)):
        for c in probe[qi]:
            cid_to_qis.setdefault(int(c), []).append(qi)
    files, filesystem = _shard_files(
        index_path, [f"centroid=c{c:04d}" for c in sorted(cid_to_qis)]
    )
    if not files:
        return _empty_topk(k)
    ds = ray.data.read_parquet(files, filesystem=filesystem, columns=["vec_id", "codes", "cid"])
    state_ref = ray.put((query_ids, base, luts, cid_to_qis))
    jj = np.arange(m)

    # ADC as a _routed_scorer instantiation: same routing/self-
    # exclusion/tie-break shell as the raw-vector indexes, only the
    # features (codes matrix) and the score (LUT gather) differ.
    def prep(state, b: pa.Table) -> np.ndarray:
        codes_col = b.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        return codes_col.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, m)

    def score_fn(state, codes, cand, qi, bucket) -> np.ndarray:
        _qids, base, luts, _routing = state
        return base[qi, int(bucket)] + luts[qi][jj[None, :], codes[cand]].sum(axis=1)

    partials = _scored_partials(ds, _routed_scorer(state_ref, "cid", k, prep, score_fn), k=max(k, 64))
    return _merge_topk(partials, k)


def refine_topk(
    embeddings: ray.data.Dataset,
    adc_candidates: pa.Table,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    dim: int = 64,
) -> pa.Table:
    """Exact re-rank of ADC candidates (the FAISS IndexRefineFlat
    stage): PQ codes can rank a cluster but not resolve near-ties
    inside it, so production IVF-PQ retrieves R > k by ADC and
    re-scores those R·|queries| rows with true vectors. The refine
    read goes back to the SOURCE embeddings with a broadcast id filter
    (map-side is_in, no shuffle) — at index scale this is the point-
    lookup tier, and its cost is |candidates|, never |table|."""
    d = adc_candidates.to_pydict()
    cand_by_q: dict[int, set] = {}
    for qid, nid in zip(d["query_id"], d["neighbor_id"]):
        cand_by_q.setdefault(qid, set()).add(nid)
    all_cands = pa.array(sorted({n for s in cand_by_q.values() for n in s}), pa.int64())
    Qn = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((query_ids, Qn, cand_by_q, all_cands))

    def score(b: pa.Table, ref=ref, k=k) -> pa.Table:
        import pyarrow.compute as pc

        qids, Qn, cand_by_q, all_cands = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        b = b.filter(pc.is_in(b.column("vec_id"), value_set=all_cands))
        if b.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, dim)
        Xn = _normalize(X.astype(np.float64))
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        out_q, out_n, out_c = [], [], []
        for qi, qid in enumerate(qids):
            cands = cand_by_q.get(qid)
            if not cands:
                continue
            m = np.isin(ids, list(cands)) & (ids != qid)
            rows = np.nonzero(m)[0]
            if len(rows) == 0:
                continue
            cos = Xn[rows] @ Qn[qi]
            order = np.lexsort((ids[rows], -cos))[:k]
            out_q += [qid] * len(order)
            out_n += ids[rows[order]].tolist()
            out_c += cos[order].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = _scored_partials(embeddings, score, k=max(k, 64))
    return _merge_topk(partials, k)


# ------------------------------------------------------- k-means operator

def kmeans_assign(
    embeddings: ray.data.Dataset,
    n_clusters: int = 16,
    dim: int = 64,
    seed: int = 42,
    iters: int = IVF_ITERS,
) -> ray.data.Dataset:
    """Distributed k-means clustering over an embedding column, exposed
    as a first-class operator (the same kernel IVF index builds and
    SemDeDup use internally): centroids are fit driver-side on a
    bounded, partitioning-INDEPENDENT sample — the min(N, IVF_SAMPLE)
    rows with the smallest splitmix64(vec_id), the KMV order-statistic
    trick dedup.semantic_dedup documents — then every vector is
    assigned to its nearest centroid in ONE broadcast map_batches pass
    (centroids ray.put once, read per task). Returns one row per input
    vector: (vec_id, cluster, centroid_sim).

    centroid_sim is recomputed row-locally (elementwise product +
    fixed-length float64 sum) rather than read out of the BLAS matmul:
    sgemm blocking varies with batch shape, so matmul values differ in
    the last ulp across partitionings (measured; see semantic_dedup).

    Scale: no shuffle at all — a sample pass + an embarrassingly
    parallel assign pass; ``n_clusters`` bounds driver memory (k×dim
    floats), never corpus size."""
    # identical draw to the IVF/semantic-dedup builds: exact global
    # bottom-IVF_SAMPLE by (splitmix64(vec_id), vec_id), with the
    # repartition(16) merge level bounding the driver-side pool
    sample = _bottomk_sample(embeddings, seed)
    out_schema = pa.schema(
        [("vec_id", pa.int64()), ("cluster", pa.int64()), ("centroid_sim", pa.float64())]
    )
    if not sample:
        return ray.data.from_arrow(out_schema.empty_table())
    S = _normalize(np.asarray([r["embedding"] for r in sample], dtype=np.float64))
    C = _kmeans(S, n_clusters, iters, seed)
    c_ref = ray.put(C.astype(np.float32))

    def assign(b: pa.Table, ref=c_ref) -> pa.Table:
        C = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if b.num_rows == 0:
            return out_schema.empty_table()
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
        cl = (Xn @ C.T).argmax(axis=1).astype(np.int64)
        sim = (Xn * C[cl]).sum(axis=1, dtype=np.float64)
        return pa.table(
            {
                "vec_id": pa.array(
                    b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "cluster": pa.array(cl, pa.int64()),
                "centroid_sim": pa.array(sim, pa.float64()),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
