"""Deterministic sentence splitting and tokenization (SURVEY.md A4/A5).

The reference corpora (CoNLL04/ACE-style) arrive pre-sentencized and
pre-tokenized (upstream dataset reader, UNVERIFIED — SURVEY.md §0); for
the interleaved-document input these rule-based splitters stand in.
Both are pure functions of the text — no state, no RNG — so they are
safe inside stateless ``map_batches`` tasks and their output is
bit-stable across partitionings (SURVEY.md §4.3).

Regexes are compiled once at module import (= once per worker process),
and all per-sentence work is C-level regex scanning.
"""

from __future__ import annotations

import re

# Sentence boundary: terminal punctuation followed by whitespace.
_SENT_RE = re.compile(r"(?<=[.!?])\s+")
# Token: word (with internal apostrophe) or a single non-space symbol.
_TOK_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]")


def split_sentences(text: str) -> list[tuple[int, str]]:
    """Split into sentences, returning ``(char_start, sentence_text)``.

    char_start indexes into the assembled document text so mentions can
    be traced back to source spans (SURVEY.md §1.3 sentences schema).
    """
    out: list[tuple[int, str]] = []
    pos = 0
    for m in _SENT_RE.finditer(text):
        seg = text[pos : m.start()]
        if seg.strip():
            out.append((pos, seg))
        pos = m.end()
    tail = text[pos:]
    if tail.strip():
        out.append((pos, tail))
    return out


def tokenize(sentence: str) -> tuple[list[str], list[int]]:
    """Tokenize one sentence → (tokens, char offsets within the sentence)."""
    toks: list[str] = []
    offs: list[int] = []
    for m in _TOK_RE.finditer(sentence):
        toks.append(m.group())
        offs.append(m.start())
    return toks, offs
