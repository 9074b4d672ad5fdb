"""Surface-form normalization (SURVEY.md A17).

Canonicalization key for entity surfaces: unicode NFKC → lowercase →
strip punctuation → collapse whitespace. Fully vectorized over Arrow
string arrays with pyarrow.compute kernels — no Python loop — so it can
sit in a stateless ``map_batches`` stage on the hot path
(BASELINE.json:6 "normalized surface forms").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_surfaces(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized normalization of a string array → canonicalization keys."""
    x = pc.utf8_normalize(arr, form="NFKC")
    x = pc.utf8_lower(x)
    # Strip everything that is not a Unicode letter/mark/digit or
    # whitespace, then collapse. RE2's \w is ASCII-ONLY — using it here
    # mangled every non-Latin surface ('Müller' → 'mu ller', '日本' → ''),
    # conflating all same-type CJK/accented entities onto one empty-key
    # fallback id. \p{M} (combining marks) must be kept too: THIS
    # pyarrow's utf8_normalize emits decomposed output for every form,
    # so accented letters arrive as base + combining mark. Keys are
    # therefore consistently decomposed — fine, both the KB and the
    # mentions go through this same function.
    x = pc.replace_substring_regex(x, pattern=r"[^\p{L}\p{M}\p{N}\s]+", replacement=" ")
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    return x


def normalize_one(s: str) -> str:
    """Scalar twin of :func:`normalize_surfaces` (fixture/test use)."""
    return normalize_surfaces(pa.array([s]))[0].as_py()
