"""Corpus text cleaning — stages/analyze.clean_text.

Planted dirty strings must normalize as specified, the transform must
be idempotent (hypothesis property), and NFC must match Python's
unicodedata reference."""

from __future__ import annotations

import unicodedata

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from antnre_ray.stages.analyze import clean_text_batch


def _clean(texts: list[str]) -> list[str]:
    t = pa.table({"text": pa.array(texts, pa.string())})
    return clean_text_batch(t).column("text").to_pylist()


def test_planted_cases():
    got = _clean(
        [
            "a\x00b\x07c",                  # C0 controls stripped
            "x\u200by\ufeffz",             # zero-width + BOM stripped
            "a  \t b",                      # horizontal runs collapse
            "  lead and trail  ",           # trim
            "a \n b",                       # spaces around newline
            "p\n\n\n\nq",                   # blank-line cap
            "Cafe\u0301",                # NFC: e + combining acute
        ]
    )
    assert got == ["abc", "xyz", "a b", "lead and trail", "a\nb", "p\n\nq", "Caf\u00e9"]


def test_nfc_matches_unicodedata():
    samples = ["Cafe\u0301", "\ufb01ne", "A\u030a", "ascii only"]
    got = _clean(samples)
    for s, g in zip(samples, got):
        assert g == unicodedata.normalize("NFC", s).strip()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_idempotent(s):
    once = _clean([s])[0]
    twice = _clean([once])[0]
    assert once == twice


def test_registry_entry_runs(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["text_clean"]
    assert sql is None
    rows = fn(sf001).take_all()
    assert rows and set(rows[0]) == {"doc_id", "text"}
    # cleaning is idempotent corpus-wide
    texts = [r["text"] for r in rows[:200]]
    assert _clean(texts) == texts
