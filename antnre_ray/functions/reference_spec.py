"""The normative model spec — seeded stand-in for the reference checkpoint.

`/root/reference` was empty and torch is unavailable (SURVEY.md §0), so
"the reference AntNRE checkpoint's emitted triples" are operationally
defined by THIS module (SURVEY.md §7.4.2): a joint NER+RE model with the
reference architecture (char-CNN + word embedding → BiLSTM → CRF span
detector; span pooling + type embedding → biaffine relation classifier;
BASELINE.json:6) whose weights come from one seeded RNG plus
lexicon/trigger feature biases, so the checkpoint behaves like a trained
model on the closed-vocabulary fixture corpus (FIXTURES.md F1/F2): it
recovers planted entities and relation templates with high accuracy
while still exercising every kernel on real float math.

Both the engine's ExtractorActor and the golden-fixture generator import
`get_model()` / `extract_sentences()` from here — the P/R≥0.95 gate then
measures PIPELINE fidelity (batching, decode, provenance), the part this
repo controls. If a real checkpoint ever appears, only weight loading
changes.

Everything here is deterministic: one `default_rng(seed)` consumed in a
fixed documented order; no wall-clock; lowest-index argmax ties.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .model import bilstm_forward, biaffine_score, char_cnn, crf_viterbi, decode_bio

# ---------------------------------------------------------------- inventory
ENT_TYPES = ["Peop", "Org", "Loc", "Other"]  # CoNLL04 inventory
ENT_IDX = {t: i for i, t in enumerate(ENT_TYPES)}
TAGS = ["O"] + [f"{p}-{t}" for t in ENT_TYPES for p in ("B", "I")]  # K=9, O=0
TAG_TO_ID = {t: i for i, t in enumerate(TAGS)}
B_TAG_ID = np.array(
    [TAG_TO_ID[f"B-{t}"] for t in ENT_TYPES], dtype=np.int64
)  # B-tag emission id per ENT_TYPES index
RELATIONS = ["NONE", "Work_For", "Live_In", "OrgBased_In", "Located_In", "Kill"]
REL_TO_ID = {r: i for i, r in enumerate(RELATIONS)}

PERSONS = [
    "alice smith", "bob jones", "carol diaz", "david lee", "emma brown",
    "frank moore", "grace kim", "henry adams", "irene adler", "jack ryan",
]
ORGS = [
    "acme corp", "globex inc", "initech", "umbrella co", "stark industries",
    "wayne enterprises", "hooli", "vandelay industries",
]
LOCS = [
    "berlin", "paris", "london", "tokyo", "madrid",
    "oslo", "cairo", "sydney", "lima", "dublin",
]
OTHERS = ["gizmotron", "widgetron"]

SURFACES: dict[str, list[str]] = {"Peop": PERSONS, "Org": ORGS, "Loc": LOCS, "Other": OTHERS}

# Relation templates: (template, subj slot type, obj slot type, predicate,
# trigger word). Slot order in the string == (subj, obj).
TEMPLATES = [
    ("{s} works for {o} .", "Peop", "Org", "Work_For", "works"),
    ("{s} lives in {o} .", "Peop", "Loc", "Live_In", "lives"),
    ("{s} is based in {o} .", "Org", "Loc", "OrgBased_In", "based"),
    ("{s} is located in {o} .", "Loc", "Loc", "Located_In", "located"),
    ("{s} killed {o} .", "Peop", "Peop", "Kill", "killed"),
]
FILLERS = [
    "the quick brown fox jumps over the lazy dog .",
    "nothing notable happened today .",
    "numbers rose slightly in the third quarter .",
    "several committees reviewed the annual budget .",
]

TRIGGER_TO_REL = {
    "works": "Work_For", "employed": "Work_For",
    "lives": "Live_In", "resides": "Live_In",
    "based": "OrgBased_In", "headquartered": "OrgBased_In",
    "located": "Located_In",
    "killed": "Kill", "murdered": "Kill", "shot": "Kill",
}
TYPE_PAIR_TO_REL = {
    ("Peop", "Org"): "Work_For",
    ("Peop", "Loc"): "Live_In",
    ("Org", "Loc"): "OrgBased_In",
    ("Loc", "Loc"): "Located_In",
    ("Peop", "Peop"): "Kill",
}

# Model dimensions (small on purpose: throughput engine, not accuracy SOTA).
WORD_DIM, CHAR_DIM, CHAR_OUT, HIDDEN, TYPE_DIM = 32, 8, 16, 32, 8
NONE_BASE = 11.0  # NONE wins unless type-pair + trigger + direction agree
GAZ_BIAS = 10.0  # emission bias toward the gazetteer tag
O_BIAS = 4.0  # emission bias toward O for non-gazetteer tokens
PAIR_BIAS = 6.0
TRIGGER_BIAS = 6.0
DIR_BIAS = 2.0  # subj-precedes-obj positional feature (+/- on non-NONE labels)


def _build_vocab() -> dict[str, int]:
    words: list[str] = []
    seen = set()

    def add(w: str) -> None:
        if w not in seen:
            seen.add(w)
            words.append(w)

    for lst in SURFACES.values():
        for s in lst:
            for w in s.split():
                add(w)
    for tmpl, *_ in TEMPLATES:
        for w in tmpl.replace("{s}", "").replace("{o}", "").split():
            add(w)
    for f in FILLERS:
        for w in f.split():
            add(w)
    for w in TRIGGER_TO_REL:
        add(w)
    # ids: 0=PAD, 1=UNK, then the closed vocabulary in insertion order.
    return {w: i + 2 for i, w in enumerate(words)}


def _build_gazetteer() -> dict[str, int]:
    """word → tag id (B-type for first word of a surface, I-type for rest).

    First insertion wins on conflicts — insertion order is fixed by the
    SURFACES literal above, so this is deterministic.
    """
    gaz: dict[str, int] = {}
    for etype, lst in SURFACES.items():
        for s in lst:
            parts = s.split()
            gaz.setdefault(parts[0], TAG_TO_ID[f"B-{etype}"])
            for w in parts[1:]:
                gaz.setdefault(w, TAG_TO_ID[f"I-{etype}"])
    return gaz


@dataclass
class ModelSpec:
    vocab: dict[str, int]
    gazetteer: dict[str, int]
    word_emb: np.ndarray  # [V, WORD_DIM]
    char_emb: np.ndarray  # [C, CHAR_DIM]
    char_W: np.ndarray
    char_b: np.ndarray
    lstm: dict = field(default_factory=dict)
    emit_W: np.ndarray = None  # [2h, K]
    emit_b: np.ndarray = None  # [K]
    trans: np.ndarray = None  # [K, K]
    start: np.ndarray = None
    end: np.ndarray = None
    type_emb: np.ndarray = None  # [4, TYPE_DIM]
    U: np.ndarray = None  # [R, d, d]
    W_rel: np.ndarray = None  # [R, 2d]
    b_rel: np.ndarray = None  # [R]
    tp_bias: np.ndarray = None  # [4, 4, R] type-pair bias
    # (trigger biases are realized per sentence in extract_sentences —
    # there is no per-model trigger tensor)
    seed: int = 42

    @property
    def span_dim(self) -> int:
        return 2 * HIDDEN + TYPE_DIM


_MODEL_CACHE: dict[int, ModelSpec] = {}
N_CHARS = 130  # 0=PAD, 1=OOV, 2..129 = printable ASCII by ord


def char_id(ch: str) -> int:
    o = ord(ch)
    return o - 30 if 32 <= o < 127 else 1


def get_model(seed: int = 42) -> ModelSpec:
    """Build (once per process) the seeded reference-spec checkpoint.

    RNG consumption order is part of the spec — do not reorder draws.
    """
    if seed in _MODEL_CACHE:
        return _MODEL_CACHE[seed]
    rng = np.random.default_rng(seed)
    vocab = _build_vocab()
    gaz = _build_gazetteer()
    V = len(vocab) + 2
    K, R = len(TAGS), len(RELATIONS)
    f32 = np.float32

    def draw(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(f32)

    word_emb = draw(V, WORD_DIM, scale=0.5)
    char_emb = draw(N_CHARS, CHAR_DIM, scale=0.5)
    # PAD char (id 0) must embed to ZEROS: conv windows at a token's edge
    # see either the explicit zero edge-pad or PAD cells, and if those
    # disagree a token's char feature depends on the char-matrix width of
    # the batch it was computed in — i.e. on co-batched tokens — breaking
    # the bit-stable-across-partitionings rule (SURVEY.md §7.4.1).
    char_emb[0] = 0.0
    char_W = draw(3 * CHAR_DIM, CHAR_OUT)
    char_b = np.zeros(CHAR_OUT, f32)
    D = WORD_DIM + CHAR_OUT
    lstm = {
        "Wx_f": draw(D, 4 * HIDDEN), "Wh_f": draw(HIDDEN, 4 * HIDDEN), "b_f": np.zeros(4 * HIDDEN, f32),
        "Wx_b": draw(D, 4 * HIDDEN), "Wh_b": draw(HIDDEN, 4 * HIDDEN), "b_b": np.zeros(4 * HIDDEN, f32),
    }
    emit_W = draw(2 * HIDDEN, K)
    emit_b = np.zeros(K, f32)
    # CRF transitions: small noise + hard BIO structural constraints
    # (I-Y reachable only from B-Y / I-Y).
    trans = draw(K, K, scale=0.05)
    for to_t, to_name in enumerate(TAGS):
        if to_name.startswith("I-"):
            ty = to_name[2:]
            for fr, fr_name in enumerate(TAGS):
                if fr_name not in (f"B-{ty}", f"I-{ty}"):
                    trans[fr, to_t] = -10000.0
    start = draw(K, scale=0.05)
    for i, name in enumerate(TAGS):
        if name.startswith("I-"):
            start[i] = -10000.0
    end = draw(K, scale=0.05)
    type_emb = draw(len(ENT_TYPES), TYPE_DIM, scale=0.5)
    d = 2 * HIDDEN + TYPE_DIM
    U = draw(R, d, d, scale=0.05)
    W_rel = draw(R, 2 * d, scale=0.05)
    b_rel = np.zeros(R, f32)
    b_rel[REL_TO_ID["NONE"]] = NONE_BASE
    tp_bias = np.zeros((len(ENT_TYPES), len(ENT_TYPES), R), f32)
    for (ts, to), rel in TYPE_PAIR_TO_REL.items():
        tp_bias[ENT_TYPES.index(ts), ENT_TYPES.index(to), REL_TO_ID[rel]] = PAIR_BIAS
    spec = ModelSpec(
        vocab=vocab, gazetteer=gaz, word_emb=word_emb, char_emb=char_emb,
        char_W=char_W, char_b=char_b, lstm=lstm, emit_W=emit_W, emit_b=emit_b,
        trans=trans, start=start, end=end, type_emb=type_emb, U=U,
        W_rel=W_rel, b_rel=b_rel, tp_bias=tp_bias, seed=seed,
    )
    _MODEL_CACHE[seed] = spec
    return spec


# ------------------------------------------------------------ inference path

BUCKET = 128  # sentences per length bucket (padding waste control)
_MAX_TOKEN_CACHE = 500_000


def _token_features(
    model: ModelSpec, tokens: set[str], cache: dict[str, tuple[int, int, np.ndarray]]
) -> None:
    """Fill ``cache`` with (word_id, gaz_tag, char_feat) for new tokens.

    Char-CNN features are a pure function of the token string, so they
    are computed once per UNIQUE lowercase token and reused — on real
    corpora uniques are ~2% of occurrences (measured 47k→1k per batch),
    which removes the profile's dominant cost.
    """
    new = [t for t in tokens if t not in cache]
    if not new:
        return
    if len(cache) + len(new) > _MAX_TOKEN_CACHE:
        # Evict BEFORE deciding what to compute: after a clear, every
        # token of this call must be recomputed — clearing after the
        # `new` split would leave the batch's already-cached tokens
        # missing and the caller's feat_cache[tok] lookup would KeyError
        # on exactly the large corpora the cache exists for.
        cache.clear()
        new = list(tokens)
    L = min(max(len(t) for t in new), 16)
    char_ids = np.zeros((len(new), max(L, 1)), dtype=np.int32)
    for k, tok in enumerate(new):
        for p, ch in enumerate(tok[:L]):
            char_ids[k, p] = char_id(ch)
    feats = char_cnn(char_ids, model.char_emb, model.char_W, model.char_b)
    vocab, gaz = model.vocab, model.gazetteer
    for k, tok in enumerate(new):
        cache[tok] = (vocab.get(tok, 1), gaz.get(tok, -1), feats[k])


def encode_token_lists(
    token_lists: list[list[str]],
) -> tuple[list[str], np.ndarray, np.ndarray, np.ndarray]:
    """Dictionary-encode a batch of tokenized sentences ONCE: all
    per-token Python work (.lower(), vocab/gazetteer/trigger dict gets)
    then happens per UNIQUE raw token; occurrences become one int32 id
    stream plus numpy gathers. Returns (unique_raw_tokens,
    ids_flat, tok_counts, sent_offsets[B+1]). The actor path builds the
    same encoding straight from the Arrow column (pyarrow
    dictionary_encode — no per-occurrence Python strings at all)."""
    B = len(token_lists)
    raw_to_id: dict[str, int] = {}
    ids_flat = np.empty(sum(len(t) for t in token_lists), dtype=np.int64)
    tok_counts = np.empty(B, dtype=np.int64)
    k = 0
    uniq_raw: list[str] = []
    for si, toks in enumerate(token_lists):
        tok_counts[si] = len(toks)
        for tok in toks:
            rid = raw_to_id.get(tok)
            if rid is None:
                rid = len(uniq_raw)
                raw_to_id[tok] = rid
                uniq_raw.append(tok)
            ids_flat[k] = rid
            k += 1
    sent_off = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(tok_counts, out=sent_off[1:])
    return uniq_raw, ids_flat, tok_counts, sent_off


def extract_sentences(
    model: ModelSpec,
    token_lists: list[list[str]] | None,
    max_mentions: int = 10,
    feat_cache: dict | None = None,
    encoded: tuple | None = None,
) -> list[tuple[list[tuple[int, int, str, float]], list[tuple[int, int, str, float]]]]:
    """Joint NER+RE over a batch of tokenized sentences.

    Returns, per sentence: ``(mentions, triples)`` where mentions are
    ``(start, end, ent_type, score)`` half-open token spans and triples
    are ``(subj_mention_idx, obj_mention_idx, predicate, score)``.

    Sentences are length-bucketed (sorted by length, fixed-size chunks)
    so LSTM/CRF padding cost tracks each bucket's max length instead of
    the batch max; results are mapped back to input order. Per-sentence
    results stay batching-independent (masked recurrence + per-row
    matmuls), so bucketing cannot change the emitted triple set
    (SURVEY.md §7.4.1). ``feat_cache`` is the actor-held per-token
    feature cache; pass a dict that outlives the call for reuse.
    """
    if encoded is None:
        encoded = encode_token_lists(token_lists)
    uniq_raw, ids_flat_global, tok_counts, sent_off = encoded
    B = len(tok_counts)
    if B == 0:
        return []
    if feat_cache is None:
        feat_cache = {}
    uniq_low = [t.lower() for t in uniq_raw]
    uniq = set(uniq_low)
    _token_features(model, uniq, feat_cache)

    # Batch-local feature matrix: one gather per bucket instead of three
    # numpy row-assignments per token. Local id 0 is the zero pad row.
    local: dict[str, int] = {}
    wid_l, gaz_l, cf_l = [1], [-1], [np.zeros(CHAR_OUT, np.float32)]
    for tok in uniq:
        wid, g, cf = feat_cache[tok]
        local[tok] = len(wid_l)
        wid_l.append(wid)
        gaz_l.append(g)
        cf_l.append(cf)
    Wfeat = np.concatenate(
        [model.word_emb[np.asarray(wid_l)], np.stack(cf_l)], axis=1
    ).astype(np.float32)
    Wfeat[0] = 0.0  # pad row
    gaz_arr = np.asarray(gaz_l, dtype=np.int32)
    # Per-unique-token LSTM input projections: Xp rows are a pure
    # function of the token, so ONE [U+1, D]@[D, 4h] gemm here replaces
    # every bucket's [nb·T, D] input gemm with a row gather — and makes
    # Xp independent of bucketing entirely (the per-bucket gemm's last
    # ulps varied with its row count on this BLAS build; a per-token
    # projection cannot). ~20% of the extraction kernel at corpus scale.
    XpW_f = Wfeat @ model.lstm["Wx_f"]
    XpW_b = Wfeat @ model.lstm["Wx_b"]
    # raw-unique id → batch-local id / trigger relation id (−1 = none)
    local_by_rid = np.array([local[t] for t in uniq_low], dtype=np.int32)
    trig_by_rid = np.array(
        [
            REL_TO_ID[TRIGGER_TO_REL[t]] if t in TRIGGER_TO_REL else -1
            for t in uniq_low
        ],
        dtype=np.int32,
    )
    local_flat_global = local_by_rid[ids_flat_global]
    trig_flat_global = trig_by_rid[ids_flat_global]

    lengths_all = np.maximum(tok_counts, 1).astype(np.int32)
    order = np.argsort(lengths_all, kind="stable")

    sent_mentions: list[list[tuple[int, int, str, float]]] = [[] for _ in range(B)]
    all_subj_vecs, all_obj_vecs, pair_bias_rows, pair_meta = [], [], [], []

    for c0 in range(0, B, BUCKET):
        idxs = order[c0 : c0 + BUCKET]
        lengths = lengths_all[idxs]
        T = int(lengths.max())
        nb = len(idxs)
        # Ragged gather + one scatter: per-token Python/numpy scalar
        # work was ~100 ns per occurrence and profiled top-5.
        ids_mat = np.zeros((nb, T), dtype=np.int32)
        lens_tok = tok_counts[idxs]
        total = int(lens_tok.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens_tok) - lens_tok, lens_tok
        )
        rows = np.repeat(np.arange(nb, dtype=np.int64), lens_tok)
        src_idx = np.repeat(sent_off[idxs], lens_tok) + pos
        ids_mat[rows, pos] = local_flat_global[src_idx]
        gaz_tag = gaz_arr[ids_mat]  # pad rows → -1
        # lengths ascend within a bucket (global argsort + chunk) → the
        # sorted fast path with pre-projected inputs (pad row 0 of XpW
        # is all-zero because Wfeat[0] is).
        Xp_f = XpW_f[ids_mat] + model.lstm["b_f"]
        Xp_b = XpW_b[ids_mat] + model.lstm["b_b"]
        H = bilstm_forward(
            None, None, model.lstm, lengths=lengths, Xp_f=Xp_f, Xp_b=Xp_b
        )  # [nb, T, 2h]
        emissions = H @ model.emit_W + model.emit_b  # [nb, T, K]
        # Prefix sums for span pooling: span mean = (C[e] - C[s]) / (e-s)
        # replaces one tiny .mean() call per span (profiled at ~10% of
        # the stage). Padded positions are exact zeros, so a row's
        # cumsum — and thus every span vector — is independent of the
        # bucket's max length (bit-stability across batchings holds).
        Hc = np.concatenate(
            [np.zeros((len(idxs), 1, H.shape[2]), np.float32), np.cumsum(H, axis=1)], axis=1
        )
        # Lexicon feature column: gazetteer hits push their tag, misses push O.
        has_gaz = gaz_tag >= 0
        emissions[..., 0] += np.where(has_gaz, 0.0, O_BIAS)
        rows, cols = np.nonzero(has_gaz)
        emissions[rows, cols, gaz_tag[rows, cols]] += GAZ_BIAS
        tags = crf_viterbi(emissions, lengths, model.trans, model.start, model.end)
        # Emission prefix sums AFTER the lexicon biases (span scores are
        # means of the biased emissions).
        Ec = np.concatenate(
            [np.zeros((len(idxs), 1, emissions.shape[2]), np.float32), np.cumsum(emissions, axis=1)],
            axis=1,
        )

        # Span decode stays per-sentence Python (BIO walk); everything
        # numeric below is vectorized per BUCKET — the per-span
        # np.concatenate and per-pair np.full/adds were the stage's
        # second-largest cost after the LSTM. Elementwise op order and
        # dtypes mirror the old per-span code exactly (float32 division
        # by a float32 width ≡ division by a Python int under NumPy's
        # weak scalar promotion), so outputs stay byte-identical.
        sp_bi: list[int] = []
        sp_s: list[int] = []
        sp_e: list[int] = []
        sp_t: list[int] = []
        sent_spans: list[tuple[int, int, list]] = []  # (i, first_span_row, spans)
        trig_rows = np.zeros((nb, len(RELATIONS)), dtype=np.float32)
        for bi, i in enumerate(idxs):
            n = int(tok_counts[i])
            if n == 0:
                continue
            spans = decode_bio(list(tags[bi, :n]), TAGS)[:max_mentions]
            if spans:
                sent_spans.append((i, bi, len(sp_bi), spans))
                for (s, e, etype) in spans:
                    sp_bi.append(bi)
                    sp_s.append(s)
                    sp_e.append(e)
                    sp_t.append(ENT_IDX[etype])
                # Trigger features: relation-indicative words present.
                tr = trig_flat_global[sent_off[i] : sent_off[i + 1]]
                trig_rows[bi, tr[tr >= 0]] = TRIGGER_BIAS
        if not sp_bi:
            continue
        b_arr = np.asarray(sp_bi, dtype=np.int64)
        s_arr = np.asarray(sp_s, dtype=np.int64)
        e_arr = np.asarray(sp_e, dtype=np.int64)
        t_arr = np.asarray(sp_t, dtype=np.int64)
        widths = (e_arr - s_arr).astype(np.float32)
        D = (Hc[b_arr, e_arr] - Hc[b_arr, s_arr]) / widths[:, None]
        V = np.concatenate([D, model.type_emb[t_arr]], axis=1)  # [nspans, span_dim]
        tid_arr = B_TAG_ID[t_arr]
        sp_scores = (Ec[b_arr, e_arr, tid_arr] - Ec[b_arr, s_arr, tid_arr]) / widths
        # mentions back to their sentences; ordered pair index lists
        pa_rows: list[int] = []
        pb_rows: list[int] = []
        for i, bi, row0, spans in sent_spans:
            m = len(spans)
            sent_mentions[i] = [
                (s, e, etype, float(sp_scores[row0 + j]))
                for j, (s, e, etype) in enumerate(spans)
            ]
            if m < 2:
                continue
            for a in range(m):
                for bdx in range(m):
                    if a != bdx:
                        pa_rows.append(row0 + a)
                        pb_rows.append(row0 + bdx)
                        pair_meta.append((i, a, bdx))
        if not pa_rows:
            continue
        pa_arr = np.asarray(pa_rows, dtype=np.int64)
        pb_arr = np.asarray(pb_rows, dtype=np.int64)
        all_subj_vecs.append(V[pa_arr])
        all_obj_vecs.append(V[pb_arr])
        base = model.tp_bias[t_arr[pa_arr], t_arr[pb_arr]]  # [np, R]
        trig_b = trig_rows[b_arr[pa_arr]]
        dir_col = np.where(
            s_arr[pa_arr] < s_arr[pb_arr], DIR_BIAS, -DIR_BIAS
        ).astype(np.float32)
        dir_mat = np.broadcast_to(dir_col[:, None], base.shape).copy()
        dir_mat[:, REL_TO_ID["NONE"]] = 0.0
        pair_bias_rows.append((base + trig_b) + dir_mat)

    # One batched biaffine scoring over ALL pairs in the batch.
    if all_subj_vecs:
        S = np.concatenate(all_subj_vecs).astype(np.float32)
        O = np.concatenate(all_obj_vecs).astype(np.float32)
        scores = biaffine_score(S, O, model.U, model.W_rel, model.b_rel)
        scores += np.concatenate(pair_bias_rows)
        best = scores.argmax(axis=1)  # lowest-index ties
        best_scores = scores[np.arange(len(best)), best]
    else:
        best = np.zeros(0, dtype=np.int64)
        best_scores = np.zeros(0, dtype=np.float32)
    triples_per_sent: list[list[tuple[int, int, str, float]]] = [[] for _ in range(B)]
    for (i, a, bdx), r, sc in zip(pair_meta, best, best_scores):
        if RELATIONS[r] != "NONE":
            triples_per_sent[i].append((a, bdx, RELATIONS[r], float(sc)))
    return [(sent_mentions[i], triples_per_sent[i]) for i in range(B)]
