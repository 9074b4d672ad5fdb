"""Training-data-pipeline queries: dedup suite, similarity search, text
analysis, multimodal plumbing — registered alongside the relational ops.

Near-dup queries run over a corpus with PLANTED duplicates (a mutated
copy of ~1 in 3 documents, deterministic), so the results are non-trivial
at every scale factor; tests assert recall on the planted pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import stable_u64
from ..sources.corpus import derive_interleaved
from ..stages.analyze import text_analysis, text_stats
from ..stages.dedup import (
    drop_list,
    embedding_dedup_pairs,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from ..stages.media import media_features, media_refs
from ..stages.similarity import ann_lsh_topk
from .registry import register

DUP_OFFSET = 10_000_000


def _mutate_batch(batch: pa.Table) -> pa.Table:
    """Deterministic near-dup generator: for docs with hash%3==0, emit a
    copy (doc_id + DUP_OFFSET) with every 25th word replaced — a ~0.7–0.8
    shingle-Jaccard twin (each swap kills 3 word-3-gram shingles, so a
    denser mutation would drop J below the LSH band sweet spot)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    o_id, o_text = [], []
    for did, text in zip(doc_ids, texts):
        if stable_u64(f"dup|{did}") % 3 != 0:
            continue
        words = (text or "").split()
        for i in range(3, len(words), 25):
            words[i] = "xqz"
        o_id.append(did + DUP_OFFSET)
        o_text.append(" ".join(words))
    return pa.table({"doc_id": pa.array(o_id, pa.int64()), "text": pa.array(o_text, pa.string())})


def documents_with_dups(sf_dir: str) -> ray.data.Dataset:
    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    dups = base.map_batches(_mutate_batch, batch_format="pyarrow", zero_copy_batch=True)
    return base.union(dups)


def planted_dup_ids(sf_dir: str) -> set[int]:
    """Ground truth for recall tests: source ids that got a mutated copy."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column("doc_id").to_pylist()
    return {i for i in ids if stable_u64(f"dup|{i}") % 3 == 0}


def source_tag(sf_dir: str) -> tuple:
    """Staleness-proof memo key: (sf_dir, size, mtime_ns) of the source
    documents.parquet — a regenerated corpus at the same path gets a
    fresh cache entry instead of silently serving the old results
    (same rule as _index_tag below)."""
    import os

    try:
        st = os.stat(f"{sf_dir}/documents.parquet")
        return (sf_dir, st.st_size, st.st_mtime_ns)
    except OSError:
        return (sf_dir, -1, -1)


_MINHASH_PAIRS_CACHE: dict[tuple, ray.data.Dataset] = {}


def _minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """Memoized (materialized) minhash pair set per sf_dir: three
    registered queries (pairs, drop list, clean corpus) consume it, and
    Ray re-executes a lazy pipeline per consumer. Pairs are tiny."""
    key = source_tag(sf_dir)
    if key not in _MINHASH_PAIRS_CACHE:
        _evict_same_path(_MINHASH_PAIRS_CACHE, sf_dir)
        _MINHASH_PAIRS_CACHE[key] = minhash_dedup_pairs(
            documents_with_dups(sf_dir), threshold=0.5
        ).materialize()
    return _MINHASH_PAIRS_CACHE[key]


def _evict_same_path(cache: dict, sf_dir: str) -> None:
    """Drop superseded entries for the same path before inserting a new
    tag — otherwise every corpus regeneration pins another materialized
    Dataset in the object store for the process lifetime."""
    for k in [k for k in cache if k[0] == sf_dir]:
        del cache[k]


@register("dedup_minhash_pairs", None)
def dedup_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    return _minhash_pairs(sf_dir)


@register("dedup_ngram_jaccard_pairs", None)
def dedup_ngram_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    return ngram_jaccard_pairs(documents_with_dups(sf_dir), threshold=0.5)


@register("dedup_simhash_pairs", None)
def dedup_simhash_pairs(sf_dir: str) -> ray.data.Dataset:
    return simhash_dedup_pairs(documents_with_dups(sf_dir), max_hamming=6)


@register("dedup_drop_list", None)
def dedup_drop_list(sf_dir: str) -> ray.data.Dataset:
    return drop_list(_minhash_pairs(sf_dir))


@register("dedup_clean_corpus", None)
def dedup_clean_corpus(sf_dir: str) -> ray.data.Dataset:
    """End-to-end dedup: near-dup pairs → drop list → corpus minus drops
    via a co-partition anti join (stages/dedup.apply_drop_list)."""
    from ..stages.dedup import apply_drop_list

    drops = drop_list(_minhash_pairs(sf_dir))
    return apply_drop_list(documents_with_dups(sf_dir), drops)


def _embeddings_with_dups(sf_dir: str) -> ray.data.Dataset:
    base = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def mutate(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_pylist()
        emb = b.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = emb.flatten().to_numpy(zero_copy_only=False).reshape(b.num_rows, -1)
        keep = [i for i, v in enumerate(ids) if stable_u64(f"edup|{v}") % 4 == 0]
        if not keep:
            return pa.table({"vec_id": pa.array([], pa.int64()), "embedding": pa.array([], emb.type)})
        Xk = X[keep].astype(np.float32)
        rng = np.random.default_rng(7)
        Xk = Xk + 0.01 * rng.standard_normal(Xk.shape).astype(np.float32)
        out_ids = [ids[i] + DUP_OFFSET for i in keep]
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array([row.tolist() for row in Xk], emb.type),
            }
        )

    return base.union(base.map_batches(mutate, batch_format="pyarrow", zero_copy_batch=True))


@register("dedup_embedding_pairs", None)
def dedup_embedding_pairs(sf_dir: str) -> ray.data.Dataset:
    return embedding_dedup_pairs(_embeddings_with_dups(sf_dir), threshold=0.98)


@register("embed_kmeans", None)
def embed_kmeans(sf_dir: str) -> ray.data.Dataset:
    """k-means cluster assignments over the embeddings table
    (stages/similarity.kmeans_assign): one row per vector with its
    cluster id and similarity to the winning centroid."""
    from ..stages.similarity import kmeans_assign

    return kmeans_assign(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]),
        n_clusters=16,
    )


@register("dedup_substring", None)
def dedup_substring(sf_dir: str) -> ray.data.Dataset:
    """Exact substring dedup (Lee et al. 2022 ExactSubstr shape) over
    the planted-dup corpus: the mutated copies (every 25th word swapped)
    share exact runs of up to 24 tokens with their originals, so w=15
    excises most of each copy's text while the originals — the
    lexicographic-min keepers — survive verbatim. Returns one row per
    input doc: (doc_id, text, removed_tokens)."""
    from ..stages.dedup import substring_dedup

    return substring_dedup(documents_with_dups(sf_dir), w=15)


@register("dedup_semantic", None)
def dedup_semantic(sf_dir: str) -> ray.data.Dataset:
    """SemDeDup over the embeddings table with planted near-twins: one
    keep/drop decision row per vector (stages/dedup.semantic_dedup);
    the planted +DUP_OFFSET twins land in their originals' clusters and
    exactly one of each near-dup set survives."""
    from ..stages.dedup import semantic_dedup

    return semantic_dedup(_embeddings_with_dups(sf_dir), n_clusters=16, threshold=0.98)


@register(
    "text_stats",
    """SELECT doc_id,
              length(text) AS n_chars,
              CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
                   ELSE len(string_split_regex(
                            regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_ws_tokens,
              length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct,
              length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
              length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
              CASE WHEN length(text) = 0 THEN 0.0
                   ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                        / length(text) END AS alpha_ratio
       FROM documents""",
)
def text_stats_query(sf_dir: str) -> ray.data.Dataset:
    return text_stats(ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


@register("text_analysis", None)
def text_analysis_query(sf_dir: str) -> ray.data.Dataset:
    return text_analysis(ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def _index_tag(sf_dir: str) -> str:
    """Staleness-proof /tmp index key: hashes the embedding table's
    (size, mtime) alongside the path and a format version, so a
    regenerated embeddings.parquet — or a layout change across rounds —
    gets a fresh index instead of silently serving stale vectors."""
    import hashlib
    import os

    src = f"{sf_dir}/embeddings.parquet"
    try:
        st = os.stat(src)
        stamp = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        stamp = "missing"
    return hashlib.sha256(f"v3|{sf_dir}|{stamp}".encode()).hexdigest()[:12]


def _ann_queries(sf_dir: str):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = tbl.slice(0, 3)
    Q = np.array(q.column("embedding").to_pylist(), dtype=np.float64)
    return Q, q.column("vec_id").to_pylist()


@register("sim_ann_lsh", None)
def sim_ann_lsh(sf_dir: str) -> pa.Table:
    Q, qids = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann_lsh_topk(ds, Q, qids, k=5)


@register("sim_ann_indexed", None)
def sim_ann_indexed(sf_dir: str) -> pa.Table:
    """Repeated-query ANN path: build (once, idempotent) a persisted
    bucket-partitioned index under /tmp, then answer the query set by
    reading ONLY the hit-bucket directories — same results as the scan
    plan (tests assert equality), without re-scanning the table per
    call."""

    from ..stages.similarity import build_ann_index, query_ann_index

    tag = _index_tag(sf_dir)
    index_path = f"/tmp/antnre_ann_index/{tag}"
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    build_ann_index(ds, index_path)
    Q, qids = _ann_queries(sf_dir)
    return query_ann_index(index_path, Q, qids, k=5)


@register("sim_ann_ivf", None)
def sim_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF-bucketed ANN (coarse k-means quantizer, nprobe dial): the
    second scale path beside hyperplane LSH. Index persisted under /tmp
    (idempotent); queries probe nprobe=8 of 64 inverted lists."""

    from ..stages.similarity import build_ivf_index, query_ivf_index

    tag = _index_tag(sf_dir)
    index_path = f"/tmp/antnre_ivf_index/{tag}"
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    build_ivf_index(ds, index_path)
    Q, qids = _ann_queries(sf_dir)
    return query_ivf_index(index_path, Q, qids, k=5, nprobe=8)


@register("sim_ann_ivfpq", None)
def sim_ann_ivfpq(sf_dir: str) -> pa.Table:
    """IVF-PQ ANN (product-quantized residuals, ADC scoring): the
    compressed scale path — 32× smaller storage than raw float32, the
    form a billion-vector index actually ships in. Recall vs brute
    force is the tested contract (tests/test_extras.py); scores are
    quantization approximations by design."""

    from ..stages.similarity import build_ivfpq_index, query_ivfpq_index, refine_topk

    tag = _index_tag(sf_dir)
    index_path = f"/tmp/antnre_ivfpq_index/{tag}"
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    build_ivfpq_index(ds, index_path)
    Q, qids = _ann_queries(sf_dir)
    # Two-stage production shape: ADC top-20 from 8-byte codes, then an
    # exact re-rank of those candidates back to top-5.
    adc = query_ivfpq_index(index_path, Q, qids, k=20, nprobe=8)
    return refine_topk(ds, adc, Q, qids, k=5)


@register("media_refs", None)
def media_refs_query(sf_dir: str) -> ray.data.Dataset:
    return media_refs(derive_interleaved(f"{sf_dir}/documents.parquet"))


@register("media_features", None)
def media_features_query(sf_dir: str) -> ray.data.Dataset:
    return media_features(media_refs(derive_interleaved(f"{sf_dir}/documents.parquet")))


@register("media_frames", None)
def media_frames_query(sf_dir: str) -> ray.data.Dataset:
    """Video frame sampling over the interleaved corpus's video spans
    (every_n=24, max 8 frames per ref) — the decode is the deterministic
    gated fake, the Ray plumbing (explode → actor pool → flat-map) real."""
    from ..stages.media import frame_samples

    return frame_samples(
        media_features(media_refs(derive_interleaved(f"{sf_dir}/documents.parquet")))
    )


@register("text_shared_passages", None)
def text_shared_passages_query(sf_dir: str) -> ray.data.Dataset:
    """Cross-document shared-passage pairs via winnowing fingerprints
    (contamination detection): run over the planted-duplicate corpus so
    every scale factor yields non-trivial pairs — the planted mutated
    twins share most selected fingerprints, which the recall test
    asserts (tests/test_text_analysis.py)."""
    from ..stages.analyze import shared_passages

    return shared_passages(documents_with_dups(sf_dir), min_shared=3)


def _corrupt_batch(batch: pa.Table) -> pa.Table:
    """Deterministically corrupt ~1/17 of derived rows, cycling through
    the three row-level violation classes validate.py detects: null
    doc_id, null text-span text, decreasing span offsets. Planting
    utility for the quarantine path — row-level Python is fine here."""
    rows = batch.to_pylist()
    for row in rows:
        did = row["doc_id"]
        h = stable_u64(f"bad|{did}")
        if h % 17 != 0:
            continue
        kind = h % 3
        spans = row["spans"]
        if kind == 0:
            row["doc_id"] = None
        elif kind == 1 or len(spans) < 2:
            for sp in spans:
                if sp["kind"] == "text":
                    sp["text"] = None
                    break
        else:
            offs = sorted((sp["offset"] for sp in spans), reverse=True)
            for sp, o in zip(spans, offs):
                sp["offset"] = o
    return pa.Table.from_pylist(rows, schema=batch.schema)


@register("quarantine_report", None)
def quarantine_report(sf_dir: str) -> ray.data.Dataset:
    """A2 quarantine sink end-to-end: derive the corpus, plant malformed
    rows, validate with a quarantine_dir so violating ROWS side-write as
    (doc_id, reason) parquet while the clean stream continues, then
    return the quarantined rows. Deterministic: the planted set is a
    pure function of doc_id, and the dir is wiped per run. The returned
    Dataset is MATERIALIZED, so a later call's dir wipe cannot pull the
    files out from under an unconsumed result.

    Deployment constraint (same as similarity.build_ann_index): the
    quarantine_dir must be a filesystem every node sees at the same
    path — node-local /tmp works single-node only; multi-node clusters
    need a shared mount or the report is silently partial."""
    import hashlib
    import shutil

    from ..stages.validate import validate

    tag = hashlib.sha256(repr(source_tag(sf_dir)).encode()).hexdigest()[:12]
    qdir = f"/tmp/antnre_quarantine/{tag}"
    shutil.rmtree(qdir, ignore_errors=True)
    corpus = derive_interleaved(f"{sf_dir}/documents.parquet").map_batches(
        _corrupt_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    n_clean = validate(corpus, quarantine_dir=qdir).count()  # consume: writes the sink
    import os

    if not os.path.isdir(qdir):  # no violations planted (tiny corpus edge)
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.string()), "reason": pa.array([], pa.string())})
        )
    out = ray.data.read_parquet(qdir).materialize()
    _ = n_clean
    return out


def clear_memo_caches() -> None:
    """Drop all in-process memoized Datasets (minhash pairs here, the
    kg extraction/linked caches). bench.py calls this between timing
    samples — otherwise a median-of-N over a memoized query measures
    the cache, not the operator."""
    _MINHASH_PAIRS_CACHE.clear()
    from . import kg_queries

    kg_queries._EXT_CACHE.clear()
    kg_queries._LINKED_CACHE.clear()
    # the adjacency oracle snapshot persists ON DISK across samples —
    # without this, "cold" timings of kg_adjacency/kg_top_entities/
    # kg_two_hop skip extraction entirely (round-5 review finding)
    import shutil

    shutil.rmtree(kg_queries._ADJ_SNAP_ROOT, ignore_errors=True)


@register("text_decontaminate", None)
def text_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Eval-set decontamination (GPT-3/Llama 13-gram rule) over the
    documents table: a deterministic ~1/37 of docs plays the held-out
    eval set (their texts' 13-gram hashes broadcast once, sorted); every
    corpus doc sharing at least one 13-gram is marked. The eval-source
    docs themselves are planted ground truth — tests assert they all
    come back contaminated and the base rate elsewhere stays low."""
    import pyarrow.parquet as pq

    from ..stages.analyze import decontaminate

    # Eval-set selection reads the id COLUMN (metadata-scale), then only
    # the selected rows via a pushed-down filter — never the full text
    # driver-side. A real deployment passes the (external, small) eval
    # set straight into stages.analyze.decontaminate.
    src = f"{sf_dir}/documents.parquet"
    ids = pq.read_table(src, columns=["doc_id"]).column("doc_id").to_pylist()
    eval_ids = [i for i in ids if stable_u64(f"eval|{i}") % 37 == 0]
    eval_texts = (
        pq.read_table(src, columns=["text"], filters=[("doc_id", "in", eval_ids)])
        .column("text")
        .to_pylist()
        if eval_ids
        else []
    )
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return decontaminate(ds, eval_texts, n=13)


@register("dedup_clusters", None)
def dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Transitive duplicate CLUSTERS: near-dup pairs → connected
    components → (doc_id, cluster) with the cluster labeled by its
    minimum member hash. The principled form of the drop-list rule:
    A~B and B~C place all three in one cluster even when A~C was never
    emitted as a pair, so keep-one-per-cluster survives chained
    near-duplicates. Reuses the two-regime graph engine over the pair
    list (pair graphs are node-small at any corpus scale — only docs
    WITH a near-duplicate appear)."""
    from ..stages.graph_algos import connected_components

    pairs = _minhash_pairs(sf_dir)

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(b.column("doc_a"), pa.string()),
                "dst": pa.compute.cast(b.column("doc_b"), pa.string()),
            }
        )

    labels = connected_components(
        pairs.map_batches(as_edges, batch_format="pyarrow", zero_copy_batch=True)
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.compute.cast(b.column("node"), pa.int64()),
                "cluster": b.column("label"),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


@register("dedup_incremental", None)
def dedup_incremental(sf_dir: str) -> pa.Table:
    """Continuous-ingest dedup: the BASE corpus is indexed once
    (persisted LSH band table under /tmp, staleness-tagged, idempotent);
    the planted mutated twins then arrive as the 'new batch' and are
    checked against the index — only hit key-shards are read, the
    corpus is never rescanned. Tests assert every planted twin finds
    its source."""
    import hashlib

    import pyarrow.parquet as pq

    from ..stages.dedup import build_minhash_index, query_minhash_index

    tag = hashlib.sha256(repr(("mhidx", source_tag(sf_dir))).encode()).hexdigest()[:12]
    index_path = f"/tmp/antnre_minhash_index/{tag}"
    base = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    build_minhash_index(base, index_path)
    new_docs_tbl = pa.concat_tables(
        [
            t
            for t in ray.get(
                ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
                .map_batches(_mutate_batch, batch_format="pyarrow", zero_copy_batch=True)
                .to_arrow_refs()
            )
            if t.num_columns
        ],
        promote_options="default",
    )
    return query_minhash_index(index_path, new_docs_tbl, threshold=0.5)


@register(
    "text_pii_redact",
    """WITH pii AS (
           SELECT doc_id,
                  text
                  || CASE WHEN doc_id % 11 = 0
                          THEN ' Contact user' || doc_id || '@example.com now.'
                          ELSE '' END
                  || CASE WHEN doc_id % 13 = 0
                          THEN ' Call 555-0123 or visit 10.0.0.1 today.'
                          ELSE '' END AS text
           FROM documents
       )
       SELECT doc_id,
              len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(text,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
              len(regexp_extract_all(text, '\\b\\d{3}-\\d{4}\\b')) AS n_phones,
              regexp_replace(
                  regexp_replace(
                      regexp_replace(text,
                          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g'),
                      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                  '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS clean_text
       FROM pii""",
)
def text_pii_redact(sf_dir: str) -> ray.data.Dataset:
    """PII scrub with a bytes-exact oracle: the corpus is amended with
    deterministic synthetic PII (emails on doc_id%11, phone+IP on
    doc_id%13 — the real tables contain none), then redacted by the
    stages.analyze.redact_pii stage. Both the per-category counts and
    the full redacted text hash-match DuckDB's regexp_replace chain
    (both engines are RE2). Planting is part of the QUERY (test
    harness), not the stage — redact_pii itself is a pure map stage."""
    import numpy as np

    from ..stages.analyze import redact_pii

    def plant(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids_str = did.astype("U20")
        email_sfx = np.where(
            did % 11 == 0,
            np.char.add(
                np.char.add(" Contact user", ids_str), "@example.com now."
            ),
            "",
        )
        phone_sfx = np.where(
            did % 13 == 0, " Call 555-0123 or visit 10.0.0.1 today.", ""
        )
        sfx = pa.array(np.char.add(email_sfx, phone_sfx).tolist(), pa.string())
        text = pc.binary_join_element_wise(b.column("text"), sfx, "")
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    return redact_pii(docs)


@register(
    "data_mix_weighted",
    """SELECT doc_id, source
       FROM documents
       WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
             < CAST(((CAST(substr(source, 4, 8) AS BIGINT) % 4) + 1)
                    * 1073741824 AS HUGEINT)""",
)
def data_mix_weighted(sf_dir: str) -> ray.data.Dataset:
    """Training-data MIXING: deterministic per-source subsampling at a
    per-source rate (here derived from the source id: 25/50/75/100 %)
    via a Knuth multiplicative hash of the doc key compared against an
    integer threshold — the standard reproducible-mixture op for
    assembling a training corpus from heterogeneous sources.

    Scale shape: pure map-only filter, no shuffle, no RNG state; the
    same doc always makes the same decision on any cluster size, so
    re-runs and resumes are idempotent. Exact-integer oracle (no float
    rate comparison): hash and threshold are both integers below 2^32."""

    def mix(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        # Knuth multiplicative hash in uint64; doc_id < 2^32 so the
        # product never wraps before the mod
        h = (did.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        srcnum = pc.cast(
            pc.utf8_slice_codeunits(b.column("source"), 3, 11), pa.int64()
        ).to_numpy(zero_copy_only=False)
        thr = ((srcnum % 4 + 1).astype(np.uint64)) * np.uint64(1 << 30)
        keep = pa.array(h < thr)
        return pa.table(
            {
                "doc_id": b.column("doc_id").filter(keep),
                "source": b.column("source").filter(keep),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(mix, batch_format="pyarrow", zero_copy_batch=True)


@register("text_pack_sequences", None)
def text_pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """Sequence packing (training-batch assembly): docs → 512-token
    context-window bins via shard-local best-fit-decreasing. Rows-only
    driver check; the packing invariants (every doc exactly once, no
    bin over budget, fill factor) are asserted in tests/test_pack.py."""
    from ..stages.pack import pack_sequences

    return pack_sequences(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        budget=512,
        shards=8,  # harness corpora are small; at 100 TB track cluster size
    )


@register("text_bm25_search", None)
def text_bm25_search(sf_dir: str) -> pa.Table:
    """BM25 lexical top-10 over documents for a fixed probe query —
    rows-only driver check; scoring parity vs a brute-force reference
    and planted-relevant-doc ranking are asserted in tests."""
    from ..stages.search import bm25_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_topk(docs, "data processing pipeline", k=10)


@register(
    "text_url_domains",
    """WITH t AS (
           SELECT doc_id,
                  text || CASE WHEN doc_id % 9 = 0
                               THEN ' See https://site' || (doc_id % 5)
                                    || '.example.org/page' || doc_id
                                    || ' for details.'
                               ELSE '' END
                       || CASE WHEN doc_id % 27 = 0
                               THEN ' Mirror: http://mirror.example.net/' || doc_id
                               ELSE '' END AS text
           FROM documents
       ),
       u AS (
           SELECT doc_id,
                  unnest(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+')) AS url
           FROM t
       )
       SELECT regexp_replace(url, '^https?://', '') AS domain,
              count(*) AS n_urls,
              count(DISTINCT doc_id) AS n_docs
       FROM u GROUP BY domain""",
)
def text_url_domains(sf_dir: str) -> ray.data.Dataset:
    """URL extraction + per-domain rollup (the provenance-audit op for
    a web corpus). URLs are planted deterministically (the synthetic
    corpus has none) so the oracle can plant identically. Extraction is
    vectorized via polars str.extract_all over the Arrow column
    (zero-copy in); each batch pre-aggregates (domain, doc_id) pair
    counts — the combiner — so the shuffle carries pair counts, never
    URLs; a final two-level groupby yields n_urls + distinct-doc
    counts. At 100 TB the shuffled key space is |domains × docs-that-
    cite-them|, orders of magnitude under the URL mention count."""
    import polars as pl

    def extract(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        ids_str = did.astype("U20")
        sfx1 = np.where(
            did % 9 == 0,
            np.char.add(
                np.char.add(
                    np.char.add(" See https://site", (did % 5).astype("U1")),
                    np.char.add(".example.org/page", ids_str),
                ),
                " for details.",
            ),
            "",
        )
        sfx2 = np.where(
            did % 27 == 0,
            np.char.add(" Mirror: http://mirror.example.net/", ids_str),
            "",
        )
        sfx = pa.array(np.char.add(sfx1, sfx2).tolist(), pa.string())
        text = pc.binary_join_element_wise(b.column("text"), sfx, "")
        s = pl.from_arrow(text)
        urls = s.str.extract_all(r"https?://[A-Za-z0-9.-]+")
        frame = pl.DataFrame({"doc_id": pl.from_arrow(pa.chunked_array([pa.array(did, pa.int64())])), "url": urls})
        frame = frame.explode("url").drop_nulls("url")
        frame = frame.with_columns(
            pl.col("url").str.replace(r"^https?://", "").alias("domain")
        )
        pairs = frame.group_by(["domain", "doc_id"]).agg(pl.len().alias("n"))
        t = pairs.to_arrow()
        return pa.table(
            {
                "domain": pc.cast(t.column("domain"), pa.string()),
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    pairs = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["domain", "doc_id"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        g = b.group_by(["domain"]).aggregate([("n", "sum"), ("doc_id", "count")])
        return g.rename_columns(["domain", "n_urls", "n_docs"])

    return (
        pairs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("domain")
        .aggregate(Sum("n_urls", alias_name="n_urls"), Sum("n_docs", alias_name="n_docs"))
    )


@register("text_repetition_filter", None)
def text_repetition_filter(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition quality gate — rows-only driver check;
    planted repetitive docs are flag-tested in tests/test_extras.py."""
    from ..stages.analyze import repetition_filter

    return repetition_filter(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


@register(
    "data_train_val_split",
    """SELECT doc_id,
              CASE WHEN (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 10 < 8
                   THEN 'train'
                   WHEN (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 10 = 8
                   THEN 'val'
                   ELSE 'test' END AS split
       FROM documents""",
)
def data_train_val_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 80/10/10 train/val/test assignment: a Knuth
    multiplicative hash of the doc key bucketed by its last decimal
    digit — the reproducible-split op every training pipeline needs.
    Pure map, no shuffle, no RNG state: the same doc lands in the same
    split on any cluster size, under resume, and across corpus
    re-shards (unlike ``ds.split_proportionately``, which is
    partition-order-dependent). Exact-integer oracle, same hash family
    as data_mix_weighted."""

    def split(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        h = ((did.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(10)
        out = np.where(h < 8, "train", np.where(h == 8, "val", "test"))
        return pa.table(
            {"doc_id": b.column("doc_id"), "split": pa.array(out, pa.string())}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


@register("text_tfidf_keywords", None)
def text_tfidf_keywords(sf_dir: str) -> ray.data.Dataset:
    """Top-3 TF-IDF keywords per document (keyword extraction /
    content tagging for corpus curation) — rows-only driver check;
    planted-keyword ranking and idf monotonicity are asserted in
    tests."""
    from ..stages.analyze import tfidf_keywords

    return tfidf_keywords(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        top_k=3,
    )


@register("text_lm_perplexity", None)
def text_lm_perplexity(sf_dir: str) -> ray.data.Dataset:
    """Unigram-LM perplexity quality gate — rows-only driver check;
    gibberish-scores-worse and determinism are tested in
    tests/test_extras.py."""
    from ..stages.analyze import lm_perplexity

    return lm_perplexity(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


@register("data_dsir_select", None)
def data_dsir_select(sf_dir: str) -> ray.data.Dataset:
    """DSIR data selection (stages/analyze.dsir_select): importance
    log-weights of every document against the src0 slice as the target
    distribution, Gumbel-top-k selection at frac=0.25 — rows-only
    driver check; target-vocabulary ranking, selection fraction,
    determinism and partition invariance are tested in
    tests/test_extras.py."""
    from ..stages.analyze import dsir_select

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    target = docs.filter(
        expr="source == 'src0'"
    ).select_columns(["doc_id", "text"])
    return dsir_select(docs.select_columns(["doc_id", "text"]), target, frac=0.25)


def _shuffle_multiplier(seed: int) -> int:
    """Odd 64-bit multiplier for the global-shuffle permutation,
    DECORRELATED per seed: splitmix64(seed) | 1. Deriving it as
    base + 2·seed instead (the first round-5 keying) was a real bug —
    adjacent seeds changed each key by only 2·(doc_id+1), orders of
    magnitude below the ~2^64/N key spacing, so different epochs got
    the SAME document order (caught by
    tests/test_wave12.py::test_global_shuffle_seed_changes_order)."""
    from ..functions.hashing import mix64

    return int(mix64(np.array([0], dtype=np.uint64), seed=seed)[0] | np.uint64(1))


@register(
    "data_global_shuffle",
    # exact DuckDB replica: the same multiplicative permutation in
    # HUGEINT, signed back to the int64 view the engine emits. The +1
    # happens AFTER the HUGEINT cast — `doc_id + 1` in int64 would
    # overflow at doc_id = 2^63-1 where the numpy kernel wraps fine
    # (round-5 review finding). The driver's compare is
    # order-insensitive, but the bijective key IS the order.
    f"""SELECT doc_id, text,
               CAST(((CAST(doc_id AS HUGEINT) + 1) * {_shuffle_multiplier(7)})
                    % 18446744073709551616
                    - CASE WHEN ((CAST(doc_id AS HUGEINT) + 1) * {_shuffle_multiplier(7)})
                                % 18446744073709551616 >= 9223372036854775808
                           THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS shuffle_key
        FROM documents
        ORDER BY shuffle_key""",
)
def data_global_shuffle(sf_dir: str, seed: int = 7) -> ray.data.Dataset:
    """Deterministic global training shuffle: every document gets the
    key (doc_id+1)·M_seed mod 2^64 (multiplicative hashing; M_seed =
    splitmix64(seed)|1 is odd, so the map is a BIJECTION on
    Z_2^64 — no collisions, exactly uniform) and the corpus sorts by
    it — the epoch-ordering step of an LLM data pipeline. Unlike
    Dataset.random_shuffle (per-block draws → partitioning-DEPENDENT,
    see functions/hashing notes), the key is a pure function of
    (doc_id, seed), so the order is reproducible across runs, cluster
    sizes and input layouts, and a different seed (a decorrelated odd
    multiplier → different permutation) gives a different epoch order.
    The integer-only key is replicated exactly by the DuckDB oracle
    (the data_mix_weighted precedent, VERDICT r4 ask #5).

    Scale: the sort is one range shuffle of the payload — the
    irreducible cost of a global shuffle (same exchange class Ray's
    random_shuffle pays), with Ray's sample-based range partitioner
    keeping output blocks balanced because the keys are uniform u64."""
    m = np.uint64(_shuffle_multiplier(seed))

    def key(b: pa.Table, m=m) -> pa.Table:
        did = b.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            k = (did.astype(np.uint64) + np.uint64(1)) * m
        # int64 view keeps Ray's sort comparator native; uniformity is
        # unaffected by the sign flip.
        return b.append_column("shuffle_key", pa.array(k.view(np.int64), pa.int64()))

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .sort("shuffle_key")
    )


RRF_K = 60  # standard reciprocal-rank-fusion damping constant


@register("search_hybrid_rrf", None)  # fusion math tested on fixtures
def search_hybrid_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: BM25 lexical top-20 over documents and cosine
    top-20 over embeddings (vec_id and doc_id share the id space in
    this schema), fused by Reciprocal Rank Fusion —
    score(d) = Σ_lists 1/(60 + rank_d). The standard first-stage
    retrieval pattern for curation probes: lexical catches exact
    phrasing, embeddings catch paraphrase, RRF needs no score
    calibration between the two.

    Scale: both legs are the already-scale-shaped operators (BM25's two
    sketch passes; brute-force cosine per-batch top-k merge — swap in
    query_ann_index for a persisted corpus); fusion touches only the
    two k-row lists on the driver."""
    from ..stages.search import bm25_topk
    from ..stages.similarity import brute_force_topk

    k = 20
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    lex = bm25_topk(docs, "data processing pipeline", k=k)
    Q, qids = _ann_queries(sf_dir)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sem_all = brute_force_topk(emb, Q[:1], qids[:1], k=k)
    sem_ids = sem_all.column("neighbor_id").to_pylist()

    ranks: dict[int, list[int | None]] = {}
    for r, d in enumerate(lex.column("doc_id").to_pylist()):
        ranks.setdefault(int(d), [None, None])[0] = r + 1
    for r, d in enumerate(sem_ids):
        ranks.setdefault(int(d), [None, None])[1] = r + 1
    fused = sorted(
        (
            (
                -sum(1.0 / (RRF_K + r) for r in rs if r is not None),
                d,
                rs[0],
                rs[1],
            )
            for d, rs in ranks.items()
        ),
    )[:10]
    return pa.table(
        {
            "doc_id": pa.array([d for _, d, _, _ in fused], pa.int64()),
            "rrf_score": pa.array([-s for s, _, _, _ in fused], pa.float64()),
            "bm25_rank": pa.array([b for _, _, b, _ in fused], pa.int64()),
            "cosine_rank": pa.array([c for _, _, _, c in fused], pa.int64()),
        }
    )


@register("dedup_setjoin_pairs", None)  # EXACT join — brute-force-equal in tests
def dedup_setjoin_pairs(sf_dir: str) -> ray.data.Dataset:
    """Exact set-similarity self-join (AllPairs prefix filter) over the
    planted-dup corpus: ALL pairs with word-3-gram-set Jaccard ≥ 0.5 and
    their exact J — the zero-false-negative complement to the MinHash /
    SimHash candidate generators (tests assert set-equality against an
    all-pairs brute force, not just recall)."""
    from ..stages.dedup import set_similarity_join

    return set_similarity_join(documents_with_dups(sf_dir), threshold=0.5, k=3)


@register("data_zorder_layout", None)  # layout probe → rows-only; pruning invariants tested
def data_zorder_layout(sf_dir: str) -> pa.Table:
    """Z-order (Morton) clustering payoff over events(user_id, value):
    bucket rows by Z-key prefix (a pure function of values —
    deterministic and partition-independent, standing in for z-sorted
    row groups) and report what fraction of 2^8 buckets a centered
    2-D box predicate prunes via min/max stats, vs bucketing the same
    rows by user_id alone (the single-column-sort layout). The layout
    op itself is stages/partition.zorder_sort — one aggregate + one
    map_batches + one range sort; tests/test_zorder.py verifies the
    interleave kernel bit-for-bit, sort permutation, and that Z-order
    pruning dominates single-column pruning on grid data."""
    from ray.data.aggregate import Max, Min

    from ..stages.partition import zorder_pruning_stats

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    ev = ev.materialize()  # consumed twice: box derivation + stats pass
    lo = ev.aggregate(
        Min("user_id", alias_name="ulo"),
        Max("user_id", alias_name="uhi"),
        Min("value", alias_name="vlo"),
        Max("value", alias_name="vhi"),
    )
    # centered 10%-per-side box — selective on both dimensions
    ub = (lo["uhi"] - lo["ulo"]) * 0.1
    vb = (lo["vhi"] - lo["vlo"]) * 0.1
    mid_u = (lo["uhi"] + lo["ulo"]) / 2.0
    mid_v = (lo["vhi"] + lo["vlo"]) / 2.0
    box = {
        "user_id": (mid_u - ub, mid_u + ub),
        "value": (mid_v - vb, mid_v + vb),
    }
    return zorder_pruning_stats(ev, ["user_id", "value"], box)


@register("data_corpus_divergence", None)  # corpus diagnostic → rows-only; planted-dist tested
def data_corpus_divergence(sf_dir: str) -> pa.Table:
    """Pairwise KL / Jensen-Shannon divergence between the token
    distributions of the corpus' sources (stages/analyze.
    corpus_divergence) — the data-mixing diagnostic that tells you
    whether two sources are interchangeable or complementary before
    weighting them (data_mix_weighted's dial). One hashed-n-gram count
    pass; planted identical/disjoint-vocabulary corpora pin the
    endpoints (≈0 and ≈ln 2) in tests/test_divergence.py."""
    from ..stages.analyze import corpus_divergence

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return corpus_divergence(docs)


@register(
    "data_union_evolved",
    # the oracle checks the unioned OUTPUT (every type exactly doubled);
    # the drift mechanics (null-fill, float widening) stay typed-tested
    """SELECT event_type, CAST(count(*) * 2 AS BIGINT) AS n
       FROM events GROUP BY event_type""",
)
def data_union_evolved(sf_dir: str) -> ray.data.Dataset:
    """Schema-drift union (sources/io.union_aligned): the events table
    unioned with a synthesized LEGACY snapshot of itself — value
    narrowed to float32, props absent — as evolving producers would
    leave it. The unified stream null-fills the missing column and
    widens the floats; returns per-event_type row counts (each type
    exactly doubled vs the base table) sorted by event_type."""
    from ray.data.aggregate import Count

    from ..sources.io import union_aligned

    base = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value", "props"]
    )

    def legacy(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value": b.column("value").cast(pa.float32()),
            }
        )

    old = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(legacy, batch_format="pyarrow", zero_copy_batch=True)
    both = union_aligned([base, old])
    return (
        both.groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .sort("event_type")
    )


@register(
    "text_topk_ngrams",
    # Python str.split() drops empty tokens; '\s+' splitting only makes
    # empties at string edges, so the tok <> '' filter reproduces it.
    r"""WITH docs AS (
         SELECT row_number() OVER () AS doc,
                regexp_split_to_array(lower(text), '\s+') AS arr
         FROM documents),
       toks AS (
         SELECT doc, u.tok, u.ord
         FROM docs, LATERAL (
           SELECT unnest(arr) AS tok,
                  generate_subscripts(arr, 1) AS ord) AS u
         WHERE u.tok <> ''),
       big AS (
         SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc ORDER BY ord) AS ngram
         FROM toks)
       SELECT ngram, count(*) AS n
       FROM big WHERE ngram IS NOT NULL
       GROUP BY ngram ORDER BY n DESC, ngram LIMIT 50""",
)
def text_topk_ngrams(sf_dir: str) -> pa.Table:
    """Exact global top-50 bigrams over documents.text
    (stages/analyze.topk_ngrams): per-batch Arrow group_by combiner →
    grouped Sum → per-block top-k partials merged driver-side (never a
    global sort of the vocabulary). Deterministic (count DESC, ngram
    ASC) tie break; exact integer counts. Verified against a
    collections.Counter reference in tests/test_histogram_ngrams.py."""
    from ..stages.analyze import topk_ngrams

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return topk_ngrams(docs, n=2, k=50)


@register("text_clean", None)  # text payload out → rows-only; property-tested
def text_clean(sf_dir: str) -> ray.data.Dataset:
    """Corpus text normalization (stages/analyze.clean_text): NFC,
    control/zero-width strip, whitespace collapse, trim — the
    tokenizer-hygiene pass that runs before hashing/dedup (idempotence
    is the load-bearing property: re-ingest must not churn bytes).
    Pure pyarrow.compute kernels. Returns (doc_id, text) cleaned,
    sorted by doc_id."""
    from ..stages.analyze import clean_text

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return clean_text(docs).sort("doc_id")


@register("media_frame_dedup", None)  # hashed ids → rows-only; planted-twin tested
def media_frame_dedup(sf_dir: str) -> ray.data.Dataset:
    """Near-duplicate FRAME detection across videos — the multimodal
    dedup composition (stages/media.frame_dedup_pairs): sampled frames
    re-keyed as vectors and pushed through the SAME hyperplane-LSH
    embedding dedup used for text embeddings — one operator family,
    two modalities. Returns (doc_a, doc_b, cosine) hashed frame-id
    pairs at cosine ≥ 0.999; the derived corpus has unique per-doc
    refs, so planted-twin recall is tested on hand-built frames in
    tests/test_media_dedup.py."""
    from ..stages.media import frame_dedup_pairs, frame_samples, media_features, media_refs

    frames = frame_samples(
        media_features(media_refs(derive_interleaved(f"{sf_dir}/documents.parquet")))
    )
    return frame_dedup_pairs(frames).sort(["doc_a", "doc_b"])


@register(
    "data_quality_report",
    # exact SQL replica of the five-rule report: one row per rule with
    # the engine's (rule, column, passed, observed, expected) schema.
    # in_range counts NULLs as violations (fill_null(bad, True) in the
    # streaming kernel) — COALESCE replicates that; unique counts
    # DUPLICATED KEYS (not duplicated rows).
    """SELECT 'not_null' AS rule, 'event_id' AS "column",
              count(*) FILTER (WHERE event_id IS NULL) = 0 AS passed,
              CAST(count(*) FILTER (WHERE event_id IS NULL) AS DOUBLE) AS observed,
              '0 nulls' AS expected FROM events
       UNION ALL
       SELECT 'not_null', 'event_type',
              count(*) FILTER (WHERE event_type IS NULL) = 0,
              CAST(count(*) FILTER (WHERE event_type IS NULL) AS DOUBLE),
              '0 nulls' FROM events
       UNION ALL
       SELECT 'unique', 'event_id', count(*) = 0, CAST(count(*) AS DOUBLE),
              '0 duplicated keys'
       FROM (SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)
       UNION ALL
       SELECT 'in_range', 'user_id',
              count(*) FILTER (WHERE COALESCE(user_id < 0 OR user_id > 1000000000000, TRUE)) = 0,
              CAST(count(*) FILTER (WHERE COALESCE(user_id < 0 OR user_id > 1000000000000, TRUE)) AS DOUBLE),
              '[0, 1000000000000]' FROM events
       UNION ALL
       SELECT 'row_count_between', '', count(*) BETWEEN 1 AND 1000000000000,
              CAST(count(*) AS DOUBLE), '[1, 1000000000000]' FROM events""",
)
def data_quality_report(sf_dir: str) -> pa.Table:
    """Declarative data-quality expectations over the events table
    (stages/expect.expectations_report): one shared streaming pass for
    null/range/accepted-value/row-count rules, one exact grouped count
    per uniqueness rule. The generated corpus satisfies every rule, so
    all rows report passed=True here; planted-violation coverage lives
    in tests/test_expectations.py."""
    from ..stages import expect as ex

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    rules = [
        ex.not_null("event_id"),
        ex.not_null("event_type"),
        ex.unique("event_id"),
        ex.in_range("user_id", 0, 10**12),
        ex.row_count_between(1, 10**12),
    ]
    return ex.expectations_report(ev, rules)


@register(
    "graph_cooccurrence",
    # ORACLE PRECONDITION: the engine drops baskets with > 256 distinct
    # items (bipartite_project's max_degree boilerplate rule, loudly
    # logged); this SQL counts all pairs. The driver corpora stay far
    # below the cap (|event types| ≈ 5) — a corpus that crosses it makes
    # the sweep fail on a DOCUMENTED semantic divergence, not a bug.
    """WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u,
                         event_type AS v FROM events)
       SELECT a.v AS item_a, b.v AS item_b, count(*) AS weight
       FROM d a JOIN d b ON a.u = b.u AND a.v < b.v
       GROUP BY 1, 2""",
)
def graph_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Event-type co-occurrence graph: the bipartite (user → event_type)
    edge list projected onto event types
    (stages/graph_algos.bipartite_project) — weight = number of users
    who performed both types. The co-occurrence builder every
    recommender/association pipeline starts from; brute-force equality
    and the high-degree drop rule are tested in
    tests/test_bipartite.py. Sorted by (item_a, item_b)."""
    from ..stages.graph_algos import bipartite_project

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b.column("user_id"), pa.string()),
                "dst": b.column("event_type"),
            }
        )

    edges = ev.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return bipartite_project(edges).sort(["item_a", "item_b"])


@register(
    "graph_assoc_rules",
    # same max_degree=256 oracle precondition as graph_cooccurrence
    """WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u,
                         event_type AS v FROM events),
       ic AS (SELECT v, count(*) AS n FROM d GROUP BY v),
       nb AS (SELECT count(DISTINCT u) AS n FROM d),
       pairs AS (SELECT a.v AS ia, b.v AS ib, count(*) AS w
                 FROM d a JOIN d b ON a.u = b.u AND a.v < b.v GROUP BY 1, 2),
       bidir AS (
         SELECT ia AS antecedent, ib AS consequent, w, ca.n AS d1, cb.n AS d2
         FROM pairs JOIN ic ca ON ca.v = ia JOIN ic cb ON cb.v = ib
         UNION ALL
         SELECT ib, ia, w, cb.n, ca.n
         FROM pairs JOIN ic ca ON ca.v = ia JOIN ic cb ON cb.v = ib)
       SELECT antecedent, consequent, CAST(w AS BIGINT) AS support,
              ROUND(CAST(w AS DOUBLE) / d1, 8) AS confidence,
              ROUND(CAST(w AS DOUBLE) * nb.n / (CAST(d1 AS DOUBLE) * d2), 8) AS lift
       FROM bidir CROSS JOIN nb WHERE w >= 1""",
)
def graph_assoc_rules(sf_dir: str) -> ray.data.Dataset:
    """Pairwise association rules over (user → event_type) baskets
    (stages/graph_algos.association_rules): support / confidence /
    lift per ordered type pair — the market-basket statistics on top
    of the co-occurrence projection. Hand-computed-reference tests in
    tests/test_bipartite.py. Sorted by (antecedent, consequent)."""
    from ..stages.graph_algos import association_rules

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b.column("user_id"), pa.string()),
                "dst": b.column("event_type"),
            }
        )

    edges = ev.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return association_rules(edges).sort(["antecedent", "consequent"])
