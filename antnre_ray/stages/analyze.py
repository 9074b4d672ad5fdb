"""Text-analysis stages over a documents table (doc_id, text):
quality counters (SQL-replicable), language ID, BPE-ish token counts,
winnowing fingerprints."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.textstats import (
    bpe_token_count,
    detect_language,
    quality_stats,
    winnow_fingerprint,
)


def text_stats_batch(batch: pa.Table) -> pa.Table:
    stats = quality_stats(batch.column("text"))
    return pa.table({"doc_id": batch.column("doc_id"), **stats})


def text_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(text_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def text_analysis_batch(batch: pa.Table) -> pa.Table:
    """Language ID + BPE token count + fingerprint size + quality score.

    quality_score is a simple trainability heuristic in [0,1]:
    penalizes very short docs, high punct/digit density, low alpha ratio.
    """
    texts = batch.column("text").to_pylist()
    stats = quality_stats(batch.column("text"))
    n_chars = stats["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    alpha = stats["alpha_ratio"].to_numpy(zero_copy_only=False)
    n_punct = stats["n_punct"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_digit = stats["n_digit"].to_numpy(zero_copy_only=False).astype(np.float64)
    langs, confs, bpe, fp_sizes = [], [], [], []
    for t in texts:
        lang, conf = detect_language(t)
        langs.append(lang)
        confs.append(conf)
        bpe.append(bpe_token_count(t))
        fp_sizes.append(len(winnow_fingerprint(t)))
    with np.errstate(divide="ignore", invalid="ignore"):
        dens = np.where(n_chars > 0, (n_punct + n_digit) / n_chars, 1.0)
    length_term = np.clip(n_chars / 200.0, 0.0, 1.0)
    score = np.clip(0.5 * alpha + 0.3 * length_term + 0.2 * (1.0 - dens), 0.0, 1.0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang": pa.array(langs, pa.string()),
            "lang_conf": pa.array(confs, pa.float64()),
            "n_bpe_tokens": pa.array(bpe, pa.int64()),
            "n_fingerprints": pa.array(fp_sizes, pa.int64()),
            "quality_score": pa.array(score, pa.float64()),
        }
    )


def text_analysis(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(text_analysis_batch, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Per-doc winnowing fingerprints, exploded to (doc_id, fp) rows —
    groupby(fp) downstream finds cross-document shared passages."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    o_doc, o_fp = [], []
    for did, t in zip(doc_ids, texts):
        for fp in winnow_fingerprint(t):
            o_doc.append(did)
            o_fp.append(fp)
    return pa.table({"doc_id": pa.array(o_doc, pa.int64()), "fp": pa.array(o_fp, pa.int64())})


def fingerprints(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- shared-passage detection

def _shard_fp(batch: pa.Table, shards: int) -> pa.Table:
    fp = batch.column("fp").to_numpy(zero_copy_only=False)
    return batch.append_column("shard", pa.array((fp % shards).astype(np.int32), pa.int32()))


def _shard_shared_pairs(group: pa.Table, max_df: int = 32) -> pa.Table:
    """All fingerprints of one shard, vectorized (dedup.py's SHARDS
    pattern): sort by (fp, doc_id), detect equal-fp runs, emit cross-doc
    pairs inside runs of >=2 distinct docs, pre-counted per shard (the
    combiner that caps the final pair shuffle).

    A fingerprint held by more than ``max_df`` distinct docs is
    BOILERPLATE (template text, license headers): it carries no
    pair-specific signal and alone would make the pair output quadratic
    in corpus size, so those runs are dropped entirely — the stop-word
    rule of contamination detection. Dropping (vs truncating) is exact
    for the operator's semantics: twin documents always also share
    doc-specific (low-df) fingerprints. Drops are logged per shard —
    dedup.py's no-silent-caps rule."""
    n = group.num_rows
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    if n < 2:
        return empty
    from .dedup import _key_runs

    fps = group.column("fp").to_numpy(zero_copy_only=False)
    docs = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, fps))
    fps, docs = fps[order], docs[order]
    a_parts, b_parts = [], []
    n_boiler = 0
    for s, e in zip(*_key_runs(fps)):
        if e - s < 2:
            continue
        ids = np.unique(docs[s:e])  # one doc repeating a passage is not a pair
        if len(ids) < 2:
            continue
        if len(ids) > max_df:
            n_boiler += 1
            continue
        iu, ju = np.triu_indices(len(ids), k=1)
        a_parts.append(ids[iu])
        b_parts.append(ids[ju])
    if n_boiler:
        import logging

        logging.getLogger(__name__).info(
            "shared_passages: dropped %d boilerplate fingerprints "
            "(df > %d) in shard", n_boiler, max_df
        )
    if not a_parts:
        return empty
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    pairs, cnt = np.unique(np.stack([a, b], axis=1), axis=0, return_counts=True)
    return pa.table(
        {
            "doc_a": pa.array(pairs[:, 0], pa.int64()),
            "doc_b": pa.array(pairs[:, 1], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )


def shared_passages(
    ds: ray.data.Dataset, min_shared: int = 3, max_df: int = 32
) -> ray.data.Dataset:
    """Cross-document shared-passage pairs — the winnowing payoff for
    contamination/boilerplate detection: (doc_a, doc_b, n_shared_fps)
    for every ordered pair sharing >= min_shared selected fingerprints.

    Scale shape: only (doc_id, fp) rows enter the shuffle (never text);
    the fp-space groupby shards on fp % SHARDS with vectorized run
    detection (one Python call per shard, not per fingerprint); pair
    counts are pre-combined per shard before the final grouped Sum; a
    fingerprint in more than ``max_df`` docs is dropped as boilerplate
    (see :func:`_shard_shared_pairs`), which bounds the pair output at
    ``max_df``·|fps| instead of corpus-quadratic."""
    import functools

    from ray.data.aggregate import Sum

    from .dedup import SHARDS

    pairs = (
        fingerprints(ds)
        .map_batches(_shard_fp, batch_format="pyarrow", zero_copy_batch=True,
                     fn_kwargs={"shards": SHARDS})
        .groupby("shard")
        .map_groups(
            functools.partial(_shard_shared_pairs, max_df=max_df),
            batch_format="pyarrow",
        )
    )
    agg = pairs.groupby(["doc_a", "doc_b"]).aggregate(Sum("cnt", alias_name="n_shared_fps"))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b.column("n_shared_fps"), min_shared))

    return agg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- eval-set decontamination

_DECON_PRIME = np.uint64(1099511628211)  # FNV-64 prime


def _ngram_hashes(texts: list[str], n: int) -> list[np.ndarray]:
    """Order-sensitive word n-gram hashes per text, fully vectorized:
    hash each token once (polars_u64), then combine each sliding window
    with a polynomial mix — no n-gram STRING is ever built."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.hashing import polars_u64

    out: list[np.ndarray] = []
    for t in texts:
        toks = (t or "").lower().split()
        if len(toks) < n:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        th = polars_u64(pa.array(toks))
        w = sliding_window_view(th, n)
        h = w[:, 0].copy()
        for i in range(1, n):  # loop over n (=13), not over windows
            h = h * _DECON_PRIME + w[:, i]
        out.append(h)
    return out


def decontaminate(
    ds: ray.data.Dataset, eval_texts: list[str], n: int = 13
) -> ray.data.Dataset:
    """Eval-set decontamination (the GPT-3/Llama 13-gram rule): mark
    every document sharing at least one word n-gram with any eval-set
    text. Returns (doc_id, contaminated, n_hits).

    Broadcast shape: the eval set's n-gram hashes are a SORTED uint64
    array shipped once via ray.put (eval sets are ~1e4–1e6 grams — tiny
    next to the corpus); each batch membership-tests its documents'
    gram hashes with one np.searchsorted — no shuffle, no join, the
    corpus streams through untouched."""
    eval_set = np.unique(np.concatenate(_ngram_hashes(eval_texts, n) or [np.empty(0, np.uint64)]))
    ref = ray.put(eval_set)

    def mark(b: pa.Table) -> pa.Table:
        ev = ray.get(ref)
        texts = b.column("text").to_pylist()
        hits = np.zeros(len(texts), dtype=np.int64)
        if len(ev):
            for i, h in enumerate(_ngram_hashes(texts, n)):
                if len(h):
                    pos = np.searchsorted(ev, h)
                    pos[pos == len(ev)] = 0
                    hits[i] = int((ev[pos] == h).sum())
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "contaminated": pa.array(hits > 0, pa.bool_()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


# ------------------- PII redaction (training-data scrubbing)

# RE2-only syntax: identical engines on both sides of the oracle
# (Arrow's replace_substring_regex and DuckDB's regexp_replace are both
# RE2), so the redacted text is bytes-exact comparable. Order matters:
# emails first (their local/domain parts contain digit runs an IP or
# phone pattern could eat), then IPs, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PII scrub: counts each category on the ORIGINAL text,
    then rewrites sequentially. Pure-Arrow (RE2 kernels) — no Python
    row loop; safe as a plain task-pool map_batches stage."""
    import pyarrow.compute as pc

    text = batch.column("text")
    cols: dict = {"doc_id": batch.column("doc_id")}
    for name, pat, _ in PII_PATTERNS:
        cols[f"n_{name}s"] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
    for _, pat, repl in PII_PATTERNS:
        text = pc.replace_substring_regex(text, pattern=pat, replacement=repl)
    cols["clean_text"] = text
    return pa.table(cols)


def redact_pii(ds: ray.data.Dataset) -> ray.data.Dataset:
    """PII redaction over a (doc_id, text) corpus — emails, IPv4s, US
    short phone numbers → typed placeholders, with per-doc match counts
    for audit. Stateless and streaming: at 100 TB this is a pure
    map-only stage, no shuffle."""
    return ds.map_batches(redact_pii_batch, batch_format="pyarrow", zero_copy_batch=True)


# ------------------- repetition / boilerplate quality gate

# Gopher-style rejection thresholds
REP_DUP_LINE_MAX = 0.30
REP_TOP_2GRAM_MAX = 0.20
REP_TOKEN_RUN_MAX = 0.20


def repetition_filter_batch(batch: pa.Table) -> pa.Table:
    from ..functions.textstats import repetition_stats

    texts = batch.column("text").to_pylist()
    stats = [repetition_stats(t or "") for t in texts]
    dup = np.array([s[0] for s in stats])
    gram = np.array([s[1] for s in stats])
    run = np.array([s[2] for s in stats])
    flagged = (dup > REP_DUP_LINE_MAX) | (gram > REP_TOP_2GRAM_MAX) | (run > REP_TOKEN_RUN_MAX)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "dup_line_frac": pa.array(dup, pa.float64()),
            "top_2gram_frac": pa.array(gram, pa.float64()),
            "max_token_run_frac": pa.array(run, pa.float64()),
            "flagged": pa.array(flagged),
        }
    )


def repetition_filter(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Repetition/boilerplate quality gate (the Gopher quality-rule
    family): per-doc duplicate-line, dominant-2-gram and token-run
    fractions with a flag at the standard thresholds. Map-only."""
    return ds.map_batches(
        repetition_filter_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# ----------------------------------------------- TF-IDF keyword extraction

TFIDF_BUCKETS = 1 << 20


def _df_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency partial over HASHED term buckets:
    each doc contributes its unique buckets once; the partial is the
    SPARSE (bucket, count) pairs — sketch-sized relative to the dense
    2^20 table whenever a block's vocabulary is smaller than that."""
    from ..functions.hashing import polars_u64

    seen_idx: list[np.ndarray] = []
    for t in batch.column("text").to_pylist():
        toks = (t or "").lower().split()
        if not toks:
            continue
        th = polars_u64(pa.array(list(set(toks)))) % np.uint64(TFIDF_BUCKETS)
        seen_idx.append(th.astype(np.int64))
    if seen_idx:
        all_idx = np.concatenate(seen_idx)
        uniq, cnt = np.unique(all_idx, return_counts=True)
    else:
        uniq = cnt = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "idx": pa.array([uniq.tolist()], pa.list_(pa.int64())),
            "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
            "n_docs": pa.array([batch.num_rows], pa.int64()),
        }
    )


def _merge_sparse_counts(*total_cols: str):
    """Merge fn for tree_fold over (idx: list<int64>, cnt: list<int64>,
    <total_col>: int64, ...) partial rows: concatenates the sparse
    pairs, re-uniques, and sums each scalar — integer addition, so the
    tree grouping cannot change the final dense fold."""

    def merge(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if b.num_rows == 0:
            cols = {
                "idx": pa.array([], pa.list_(pa.int64())),
                "cnt": pa.array([], pa.list_(pa.int64())),
            }
            cols.update({c: pa.array([], pa.int64()) for c in total_cols})
            return pa.table(cols)
        idx = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in b.column("idx").to_pylist()]
            or [np.empty(0, dtype=np.int64)]
        )
        cnt = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in b.column("cnt").to_pylist()]
            or [np.empty(0, dtype=np.int64)]
        )
        uniq, inv = np.unique(idx, return_inverse=True)
        summed = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(summed, inv, cnt)
        cols = {
            "idx": pa.array([uniq.tolist()], pa.list_(pa.int64())),
            "cnt": pa.array([summed.tolist()], pa.list_(pa.int64())),
        }
        cols.update(
            {
                c: pa.array([int(pc.sum(b.column(c)).as_py() or 0)], pa.int64())
                for c in total_cols
            }
        )
        return pa.table(cols)

    return merge


class _TfidfScorer:
    """Actor-pool stage: df table (4 MB int32) fetched ONCE per actor."""

    def __init__(self, df_ref, n_docs: int, top_k: int):
        import ray

        self.df = ray.get(df_ref)
        self.n_docs = n_docs
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import polars_u64

        doc_ids, terms, scores, ranks = [], [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (t or "").lower().split()
            if not toks:
                continue
            uq, tf = np.unique(toks, return_counts=True)
            th = (polars_u64(pa.array(uq.tolist())) % np.uint64(TFIDF_BUCKETS)).astype(
                np.int64
            )
            idf = np.log(self.n_docs / (1.0 + self.df[th]))
            score = (tf / len(toks)) * idf
            top = np.argsort(score)[::-1][: self.top_k]
            for r, i in enumerate(top):
                doc_ids.append(did)
                terms.append(uq[i])
                scores.append(float(score[i]))
                ranks.append(r + 1)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tfidf": pa.array(scores, pa.float64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )


def tfidf_keywords(ds, top_k: int = 3):
    """Top-k TF-IDF keywords per document, two streaming passes:

    pass 1 reduces per-block SPARSE df partials TREE-SHAPED (one
    distributed merge level via functions.fold.tree_fold, so the
    driver folds ≤ k rows, never O(num_blocks)) into one dense 2^20
    int32 table;
    pass 2 broadcasts the df table once (``ray.put`` -> actor
    ``__init__``) and scores each doc locally — no shuffle at all.
    Hash-bucketed df (2^20) trades exact idf for bounded state; a
    collision only perturbs idf of the colliding terms. The per-doc
    token loop is intrinsic to per-document scalar text ops (langid
    precedent); everything per-doc is numpy."""
    import ray

    from ..functions.fold import tree_fold

    parts = tree_fold(
        ds.map_batches(_df_partial, batch_format="pyarrow", zero_copy_batch=True),
        _merge_sparse_counts("n_docs"),
    )
    df = np.zeros(TFIDF_BUCKETS, dtype=np.int32)
    n_docs = 0
    for p in parts:
        np.add.at(df, np.asarray(p["idx"], dtype=np.int64), np.asarray(p["cnt"], dtype=np.int64))
        n_docs += p["n_docs"]
    df_ref = ray.put(df)
    return ds.map_batches(
        _TfidfScorer,
        fn_constructor_args=(df_ref, n_docs, top_k),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------------------------- unigram LM perplexity scorer

LM_BUCKETS = 1 << 20


def _tf_partial(batch: pa.Table) -> pa.Table:
    """Per-batch TERM-frequency partial over hashed buckets (the df
    partial's sibling: counts every occurrence, not every document)."""
    from ..functions.hashing import polars_u64

    idx: list[np.ndarray] = []
    n_tokens = 0
    for t in batch.column("text").to_pylist():
        toks = (t or "").lower().split()
        if not toks:
            continue
        n_tokens += len(toks)
        th = polars_u64(pa.array(toks)) % np.uint64(LM_BUCKETS)
        idx.append(th.astype(np.int64))
    if idx:
        uniq, cnt = np.unique(np.concatenate(idx), return_counts=True)
    else:
        uniq = cnt = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "idx": pa.array([uniq.tolist()], pa.list_(pa.int64())),
            "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
            "n_tokens": pa.array([n_tokens], pa.int64()),
        }
    )


class _PerplexityScorer:
    """Actor-pool stage: the corpus unigram table (4 MB int32) is
    fetched once per actor; each doc scores locally, no shuffle."""

    def __init__(self, tf_ref, total_tokens: int):
        import ray

        self.tf = ray.get(tf_ref)
        self.total = float(total_tokens)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import polars_u64

        doc_ids, ns, ppl = [], [], []
        denom = self.total + LM_BUCKETS  # add-one smoothing over buckets
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = (t or "").lower().split()
            if not toks:
                continue
            uq, tf = np.unique(toks, return_counts=True)
            th = (polars_u64(pa.array(uq.tolist())) % np.uint64(LM_BUCKETS)).astype(np.int64)
            logp = np.log2((self.tf[th] + 1.0) / denom)
            h = -(tf * logp).sum() / tf.sum()  # cross-entropy, bits/token
            doc_ids.append(did)
            ns.append(int(tf.sum()))
            ppl.append(float(2.0**h))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "perplexity": pa.array(ppl, pa.float64()),
            }
        )


def lm_perplexity(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Unigram-LM perplexity per document — the model-based quality
    gate beside the heuristic stats (Gopher/CCNet precedent: docs far
    from the corpus distribution score high and get filtered or
    down-weighted).

    Two streaming passes, same shape as :func:`tfidf_keywords`: pass 1
    reduces sparse per-block hashed term-count partials TREE-SHAPED
    (functions.fold.tree_fold — the driver folds ≤ k rows, never
    O(num_blocks)) into one dense 2^20 int32 table; pass 2 broadcasts
    the table once and scores every doc locally with add-one smoothing
    over the bucket space. Deterministic and partition-independent:
    the model is a pure function of corpus counts, each doc scores
    alone."""
    import ray

    from ..functions.fold import tree_fold

    parts = tree_fold(
        ds.map_batches(_tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        _merge_sparse_counts("n_tokens"),
    )
    tf = np.zeros(LM_BUCKETS, dtype=np.int32)
    total = 0
    for p in parts:
        np.add.at(tf, np.asarray(p["idx"], dtype=np.int64), np.asarray(p["cnt"], dtype=np.int64))
        total += p["n_tokens"]
    tf_ref = ray.put(tf)
    return ds.map_batches(
        _PerplexityScorer,
        fn_constructor_args=(tf_ref, total),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ----------------------------------------------- DSIR importance resampling

DSIR_BUCKETS = 1 << 16
_DSIR_BIGRAM_MIX = np.uint64(0xC2B2AE3D27D4EB4F)


def _dsir_doc_buckets(text: str) -> np.ndarray:
    """Hashed unigram+bigram feature buckets for one document (the DSIR
    feature map: Xie et al. 2023, arXiv:2302.03169 — hashed n-gram
    counts make the importance model a dense vector, not a vocab)."""
    from ..functions.hashing import polars_u64

    toks = (text or "").lower().split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    th = polars_u64(pa.array(toks))
    uni = th
    if len(th) > 1:
        with np.errstate(over="ignore"):
            bi = th[:-1] ^ (th[1:] * _DSIR_BIGRAM_MIX)
        feats = np.concatenate([uni, bi])
    else:
        feats = uni
    return (feats % np.uint64(DSIR_BUCKETS)).astype(np.int64)


def _dsir_partial(batch: pa.Table) -> pa.Table:
    """Per-batch hashed-feature count partial (same fold shape as
    _tf_partial; the dense table is DSIR_BUCKETS ints, never corpus-
    sized)."""
    idx: list[np.ndarray] = []
    total = 0
    for t in batch.column("text").to_pylist():
        b = _dsir_doc_buckets(t)
        total += len(b)
        if len(b):
            idx.append(b)
    if idx:
        uniq, cnt = np.unique(np.concatenate(idx), return_counts=True)
    else:
        uniq = cnt = np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "idx": pa.array([uniq.tolist()], pa.list_(pa.int64())),
            "cnt": pa.array([cnt.tolist()], pa.list_(pa.int64())),
            "n_feats": pa.array([total], pa.int64()),
            "n_docs": pa.array([batch.num_rows], pa.int64()),
        }
    )


def _dsir_counts(ds: "ray.data.Dataset") -> tuple[np.ndarray, int, int]:
    """(dense counts, total features, total docs) in ONE corpus pass —
    the doc count rides in the partials (VERDICT r3 #5: dsir_select
    previously paid a separate count() pass), tree-folded."""
    from ..functions.fold import tree_fold

    parts = tree_fold(
        ds.map_batches(_dsir_partial, batch_format="pyarrow", zero_copy_batch=True),
        _merge_sparse_counts("n_feats", "n_docs"),
    )
    counts = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    total = 0
    n_docs = 0
    for p in parts:
        np.add.at(counts, np.asarray(p["idx"], dtype=np.int64), np.asarray(p["cnt"], dtype=np.int64))
        total += p["n_feats"]
        n_docs += p["n_docs"]
    return counts, total, n_docs


class _DsirScorer:
    """Actor-pool stage: the log-ratio vector (512 KB) ships once per
    actor; each doc scores locally — no shuffle anywhere in pass 2."""

    def __init__(self, ratio_ref):
        import ray

        self.log_ratio = ray.get(ratio_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, ns, lw = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            b = _dsir_doc_buckets(t)
            doc_ids.append(did)
            ns.append(len(b))
            lw.append(float(self.log_ratio[b].sum()) if len(b) else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_feats": pa.array(ns, pa.int64()),
                "log_weight": pa.array(lw, pa.float64()),
            }
        )


def dsir_log_weights(
    raw: "ray.data.Dataset", target: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """DSIR importance log-weights (Data Selection via Importance
    Resampling, Xie et al. 2023): fit hashed-n-gram bag-of-words models
    on the TARGET corpus and the RAW corpus, broadcast the per-bucket
    log probability ratio, and score every raw doc with one sparse dot
    product — log w(x) = Σ_b count_b(x)·(log p_tgt(b) − log p_raw(b)),
    add-one smoothed over the bucket space.

    Scale shape: one count pass per corpus reduces sparse partials
    tree-shaped (functions.fold) into one dense 2^16 vector, and the
    scoring pass is embarrassingly parallel against the broadcast
    ratio. Deterministic and partition-invariant: counts are exact
    integers, the ratio is a pure function of them, docs score alone."""
    return _dsir_log_weights_counted(raw, target)[0]


def _dsir_log_weights_counted(
    raw: "ray.data.Dataset", target: "ray.data.Dataset"
) -> tuple["ray.data.Dataset", int]:
    """(scored dataset, raw doc count) — the doc count comes free from
    the raw-corpus count pass, so callers (dsir_select) never pay a
    separate count() consumer over the scored branch."""
    import ray

    tgt, tgt_total, _ = _dsir_counts(target)
    rawc, raw_total, raw_docs = _dsir_counts(raw)
    log_ratio = (
        np.log((tgt + 1.0) / (tgt_total + DSIR_BUCKETS))
        - np.log((rawc + 1.0) / (raw_total + DSIR_BUCKETS))
    )
    ratio_ref = ray.put(log_ratio)
    scored = raw.map_batches(
        _DsirScorer,
        fn_constructor_args=(ratio_ref,),
        concurrency=(1, 8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return scored, raw_docs


def dsir_select(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    frac: float = 0.25,
    seed: int = 42,
) -> "ray.data.Dataset":
    """DSIR selection: Gumbel-top-k resampling on the importance
    weights (sampling without replacement ∝ w, the paper's procedure)
    as a SCALE-SAFE two-step: each doc gets a deterministic Gumbel
    perturbation g(doc_id) added to its log-weight, and the global
    top-⌈frac·N⌉ cut is an estimated quantile threshold from a
    hash-sampled subset of scores (≤4096 driver-side scalars) rather
    than a global sort — the selected fraction is approximate
    (±O(1/√4096)), which is the right trade at corpus scale; an exact
    cut would be one distributed sort away if needed.

    Deterministic and partition-invariant: the Gumbel noise is a pure
    function of (doc_id, seed) via splitmix64, the threshold a pure
    function of the hash-sampled score set."""
    from ..functions.hashing import mix64

    def perturb(b: pa.Table, seed=seed) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        u = (mix64(ids, seed=seed).astype(np.float64) + 0.5) / 2.0**64  # (0,1)
        g = -np.log(-np.log(u))
        key = b.column("log_weight").to_numpy(zero_copy_only=False) + g
        return b.append_column("gumbel_key", pa.array(key, pa.float64()))

    weights, n_total = _dsir_log_weights_counted(raw, target)
    scored = weights.map_batches(
        perturb, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice below (threshold + filter): pay one scan

    # n_total came free with the count pass — no count() consumer here.
    if n_total == 0:
        return scored.add_column("selected", lambda df: df["gumbel_key"] > 0)
    sfrac = min(1.0, 1.25 * 4096 / n_total)
    cut64 = np.uint64(min(int(sfrac * 2.0**64), 2**64 - 1))

    def draw(b: pa.Table, cut64=cut64, seed=seed) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(mix64(ids, seed=seed ^ 0xA5A5) <= cut64))

    rows = scored.map_batches(draw, batch_format="pyarrow").take_all()
    keys = sorted((r["gumbel_key"], r["doc_id"]) for r in rows)
    thr = keys[max(0, int(len(keys) * (1.0 - frac)) - 1)][0] if keys else -np.inf

    def mark(b: pa.Table, thr=thr) -> pa.Table:
        k = b.column("gumbel_key").to_numpy(zero_copy_only=False)
        return b.append_column("selected", pa.array(k > thr))

    return scored.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------- corpus divergence

def corpus_divergence(docs: "ray.data.Dataset", group_col: str = "source") -> pa.Table:
    """Pairwise distribution divergence between document groups — the
    data-mixing diagnostic: how far apart are two sources' (hashed
    unigram+bigram) token distributions? Returns one row per unordered
    group pair: add-one-smoothed KL(a‖b), KL(b‖a) and the bounded,
    symmetric Jensen-Shannon divergence (nats; JS ≤ ln 2 ≈ 0.6931).

    Scale shape: ONE count pass — per-batch sparse (group, bucket,
    count) partials (the DSIR fold: ≤ 2^16 ints per group per batch on
    the wire) folded driver-side into |groups| dense vectors, never
    corpus-sized state; the divergence math is |groups|² × 2^16 numpy
    on the driver. Group cardinality is asserted ≤ 64 (this is a
    corpus-level diagnostic over sources, not a per-key operator —
    use a grouped aggregate for high-cardinality keys)."""

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        texts = batch.column("text").to_pylist()
        per: dict[str, list[np.ndarray]] = {}
        for g, t in zip(groups, texts):
            b = _dsir_doc_buckets(t)
            if len(b):
                per.setdefault(g, []).append(b)
        gs, idxs, cnts = [], [], []
        for g, arrs in per.items():
            uniq, cnt = np.unique(np.concatenate(arrs), return_counts=True)
            gs.append(g)
            idxs.append(uniq.tolist())
            cnts.append(cnt.tolist())
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "idx": pa.array(idxs, pa.list_(pa.int64())),
                "cnt": pa.array(cnts, pa.list_(pa.int64())),
            }
        )

    def merge_groups(b: pa.Table) -> pa.Table:
        """tree_fold merge: re-combine (g, idx, cnt) sparse rows per
        group within one batch — integer sums, order-free. The ≤64-group
        limit is enforced HERE as well as on the driver: a partition
        seeing more distinct groups than that would otherwise overflow
        tree_fold's declared rows_per_merge bound and surface as a
        cryptic bound error instead of this actionable one (review
        finding)."""
        acc: dict[str, np.ndarray] = {}
        for r_g, r_idx, r_cnt in zip(
            b.column("g").to_pylist(), b.column("idx").to_pylist(), b.column("cnt").to_pylist()
        ):
            v = acc.setdefault(r_g, np.zeros(DSIR_BUCKETS, dtype=np.int64))
            np.add.at(v, np.asarray(r_idx, dtype=np.int64), np.asarray(r_cnt, dtype=np.int64))
        if len(acc) > 64:
            raise ValueError(
                f"corpus_divergence: {len(acc)} groups in {group_col!r} — this "
                "is a source-level diagnostic (≤64 groups)"
            )
        gs, idxs, cnts = [], [], []
        for g in sorted(acc):
            nz = np.flatnonzero(acc[g])
            gs.append(g)
            idxs.append(nz.tolist())
            cnts.append(acc[g][nz].tolist())
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "idx": pa.array(idxs, pa.list_(pa.int64())),
                "cnt": pa.array(cnts, pa.list_(pa.int64())),
            }
        )

    from ..functions.fold import tree_fold

    parts = tree_fold(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge_groups,
        k=8,
        rows_per_merge=64,  # ≤64 groups asserted below
    )
    dense: dict[str, np.ndarray] = {}
    for p in parts:
        v = dense.setdefault(p["g"], np.zeros(DSIR_BUCKETS, dtype=np.int64))
        np.add.at(v, np.asarray(p["idx"], dtype=np.int64), np.asarray(p["cnt"], dtype=np.int64))
    if len(dense) > 64:
        raise ValueError(
            f"corpus_divergence: {len(dense)} groups in {group_col!r} — this is a "
            "source-level diagnostic (≤64 groups)"
        )

    # KL needs smoothing (zero-count buckets in the denominator); a
    # SMALL α keeps the uniform mass from swamping real counts the way
    # add-one over 2^16 buckets would. JS is computed on the EXACT
    # empirical distributions — it is well-defined for disjoint
    # supports (m > 0 wherever p > 0), so disjoint vocabularies land
    # at exactly ln 2 and identical ones at exactly 0.
    ALPHA = 0.01

    def smooth(c: np.ndarray) -> np.ndarray:
        return (c + ALPHA) / (c.sum() + ALPHA * DSIR_BUCKETS)

    def exact(c: np.ndarray) -> np.ndarray:
        return c / c.sum()

    def kl(p: np.ndarray, q: np.ndarray) -> float:
        mask = p > 0
        return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))

    probs = {g: smooth(c) for g, c in sorted(dense.items())}
    exacts = {g: exact(c) for g, c in sorted(dense.items())}
    names = sorted(probs)
    a_col, b_col, kl_ab, kl_ba, js_col = [], [], [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            kab = kl(probs[a], probs[b])
            kba = kl(probs[b], probs[a])
            ea, eb = exacts[a], exacts[b]
            m = 0.5 * (ea + eb)
            js = 0.5 * kl(ea, m) + 0.5 * kl(eb, m)
            a_col.append(a)
            b_col.append(b)
            kl_ab.append(round(kab, 6))
            kl_ba.append(round(kba, 6))
            js_col.append(round(js, 6))
    return pa.table(
        {
            "source_a": pa.array(a_col, pa.string()),
            "source_b": pa.array(b_col, pa.string()),
            "kl_ab": pa.array(kl_ab, pa.float64()),
            "kl_ba": pa.array(kl_ba, pa.float64()),
            "js": pa.array(js_col, pa.float64()),
        }
    )


# ----------------------------------------------- top-k n-grams

def topk_ngrams(
    docs: "ray.data.Dataset", n: int = 2, k: int = 50
) -> pa.Table:
    """Exact global top-k n-grams over documents.text — the
    vocabulary-building / corpus-inspection primitive. Tokens are
    lowercased whitespace splits (the same convention as the DSIR and
    perplexity featurizers); n-grams join with single spaces.

    Scale shape: each batch pre-aggregates its own n-gram counts with
    ONE Arrow group_by (the combiner — the wire carries distinct
    n-grams per batch, not tokens), the global fold is a grouped Sum,
    and only the top k survive the final sort. Deterministic tie break:
    (count DESC, ngram ASC). Exact integer counts → partition-invariant.
    Head-skew note: a hot n-gram costs its reducer one row per BATCH
    (post-combiner), not one per occurrence."""
    import pyarrow.compute as pc

    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch.column("text").to_pylist():
            toks = (t or "").lower().split()
            grams.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        if not grams:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        t = pa.table({"ngram": pa.array(grams, pa.string())})
        g = t.group_by(["ngram"]).aggregate([([], "count_all")])
        return g.rename_columns(["ngram", "c"])

    summed = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ngram")
        .aggregate(Sum("c", alias_name="n"))
    )
    # top-k: per-block top-k partials, then one driver-side merge —
    # never a global sort of the whole vocabulary
    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("ngram", "ascending")]
        )[:k]
        return b.take(idx)

    parts = [
        t
        for t in _ray.get(
            summed.repartition(16)
            .map_batches(block_topk, batch_size=None, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_columns > 0
    ]
    allp = pa.concat_tables(parts, promote_options="default")
    idx = pc.sort_indices(allp, sort_keys=[("n", "descending"), ("ngram", "ascending")])[:k]
    return allp.take(idx)


# ----------------------------------------------- corpus text cleaning

# C0/C1 control chars (keep \t \n \r for structure), zero-width chars,
# and the BOM — the bytes that poison tokenizers and dedup hashes.
_CLEAN_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F​‌‍﻿]"


def clean_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Normalize a text column for training: NFC unicode normalization,
    control/zero-width-char strip, horizontal-whitespace collapse,
    trim — IDEMPOTENT (clean∘clean = clean, property-tested), so
    re-running an ingest never churns bytes (which would break
    content-hash dedup and lineage fingerprints downstream).

    The strip/collapse steps are pyarrow.compute kernels. NFC is
    CPython unicodedata: this build's pc.utf8_normalize DECOMPOSES for
    every ``form`` value including NFC (measured: U+00E9 → e+U+0301),
    so it cannot produce composed output; unicodedata.is_normalized is
    a C-speed fast path that skips the (rare) rewrite."""
    import unicodedata

    import pyarrow.compute as pc

    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    vals = t.to_pylist()
    if any(v is not None and not unicodedata.is_normalized("NFC", v) for v in vals):
        t = pa.array(
            [
                v
                if v is None or unicodedata.is_normalized("NFC", v)
                else unicodedata.normalize("NFC", v)
                for v in vals
            ],
            pa.string(),
        )
    t = pc.replace_substring_regex(t, _CLEAN_CONTROL_RE, "")
    t = pc.replace_substring_regex(t, r"[ \t]+", " ")  # collapse runs
    t = pc.replace_substring_regex(t, r" ?\n ?", "\n")  # spaces around breaks
    t = pc.replace_substring_regex(t, r"\n{3,}", "\n\n")  # ≤1 blank line
    t = pc.utf8_trim_whitespace(t)
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, t)


def clean_text(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    import functools

    return ds.map_batches(
        functools.partial(clean_text_batch, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
