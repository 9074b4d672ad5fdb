"""Text-analysis kernels: language ID, quality stats, token counts,
document fingerprints. All vectorized (pyarrow.compute / numpy / one
compiled-regex pass); SQL-replicable outputs are integers or single-op
ratios so they can carry DuckDB oracles."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import polars_u64

# Language marker stopwords (closed sets, lowercase).
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for was with as his they at be this".split()),
    "de": frozenset("der die das und ist ich nicht ein eine mit von den dem sie werden".split()),
    "fr": frozenset("le la les et de un une est que pour dans vous avec sur pas".split()),
    "es": frozenset("el la los las y de un una es que por para con su del no".split()),
}
LANGS = sorted(LANG_MARKERS)  # deterministic tie order: de < en < es < fr

# A BPE-ish token regex: word pieces, numbers, or single symbols.
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def detect_language(text: str) -> tuple[str, float]:
    """n-gram/stopword heuristic language ID → (lang, confidence).

    Counts marker-stopword hits per language over the word set; returns
    'und' (undetermined) when nothing matches. Ties break by LANGS order.
    """
    words = (text or "").lower().split()
    if not words:
        return "und", 0.0
    counts = {lang: sum(1 for w in words if w in marks) for lang, marks in LANG_MARKERS.items()}
    best = max(LANGS, key=lambda l: counts[l])
    total = sum(counts.values())
    if counts[best] == 0:
        return "und", 0.0
    return best, counts[best] / total


def quality_stats(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Vectorized per-doc quality counters (all SQL-replicable):

    n_chars, n_ws_tokens (whitespace tokens), n_punct, n_digit,
    n_upper, alpha_ratio (alpha chars / chars, 0 when empty).
    """
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    def count_re(pattern: str) -> pa.Array:
        return pc.cast(pc.count_substring_regex(texts, pattern), pa.int64())

    n_punct = count_re(r"[^\w\s]")
    n_digit = count_re(r"[0-9]")
    n_upper = count_re(r"[A-Z]")
    n_alpha = count_re(r"[A-Za-z]")
    # Regex trim, NOT utf8_trim_whitespace: the Arrow kernel trims all
    # Unicode whitespace while the DuckDB oracle's trim() strips spaces
    # only — texts with leading tabs/newlines then disagree on token
    # count. Both engines use RE2, so an explicit ^\s+|\s+$ replace is
    # semantics-identical on BOTH sides (oracle updated to match).
    trimmed = pc.replace_substring_regex(texts, pattern=r"^\s+|\s+$", replacement="")
    n_ws_tokens = pc.add(
        pc.cast(pc.count_substring_regex(trimmed, r"\s+"), pa.int64()), pa.scalar(1, pa.int64())
    )
    n_ws_tokens = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), pa.scalar(0, pa.int64()), n_ws_tokens)
    alpha_ratio = pc.if_else(
        pc.equal(n_chars, 0),
        pa.scalar(0.0, pa.float64()),
        pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_chars, pa.float64())),
    )
    return {
        "n_chars": n_chars,
        "n_ws_tokens": n_ws_tokens,
        "n_punct": n_punct,
        "n_digit": n_digit,
        "n_upper": n_upper,
        "alpha_ratio": alpha_ratio,
    }


def bpe_token_count(text: str) -> int:
    """Count of BPE-ish regex tokens (one compiled-regex pass)."""
    return len(BPE_RE.findall(text or ""))


def winnow_fingerprint(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    rolling char k-gram hashes, keep each window's minimum (rightmost on
    ties) — a compact, position-robust signature for plagiarism-style
    matching. Returns sorted unique selected hashes."""
    s = (text or "").lower()
    if len(s) < k:
        return []
    grams = [s[i : i + k] for i in range(len(s) - k + 1)]
    h = polars_u64(pa.array(grams)).astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)
    if len(h) <= window:
        return sorted(set(int(x) for x in [h.min()]))
    # Sliding-window minimum via stride trick (windows are small).
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(h, window)
    mins = w.min(axis=1)
    return sorted(set(int(x) for x in np.unique(mins)))


def repetition_stats(text: str) -> tuple[float, float, float]:
    """Gopher-style repetition signals for one document:
    (dup_line_frac, top_2gram_frac, max_token_run_frac).

    - dup_line_frac: fraction of non-empty lines that repeat an
      earlier line verbatim.
    - top_2gram_frac: fraction of tokens covered by the single most
      frequent token 2-gram.
    - max_token_run_frac: longest run of one repeated token over the
      token count.
    Per-doc scalar pass (intrinsic, like detect_language): the cost is
    one split + one dict sweep per doc; the distributed stage stays a
    map-only batch op."""
    lines = [ln for ln in (s.strip() for s in text.splitlines()) if ln]
    if lines:
        seen: set[str] = set()
        dups = 0
        for ln in lines:
            if ln in seen:
                dups += 1
            seen.add(ln)
        dup_line_frac = dups / len(lines)
    else:
        dup_line_frac = 0.0
    toks = text.split()
    n = len(toks)
    if n < 2:
        return dup_line_frac, 0.0, 0.0
    grams: dict[tuple[str, str], int] = {}
    for pair in zip(toks, toks[1:]):
        grams[pair] = grams.get(pair, 0) + 1
    top = max(grams.values())
    top_2gram_frac = (2 * top) / n if top > 1 else 0.0
    best = run = 1
    for a, b in zip(toks, toks[1:]):
        run = run + 1 if a == b else 1
        if run > best:
            best = run
    max_run_frac = best / n if best > 1 else 0.0
    return dup_line_frac, top_2gram_frac, max_run_frac
