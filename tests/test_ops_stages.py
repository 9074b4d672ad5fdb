"""Unit tests for the document stages on hand-built Arrow tables
(SURVEY.md §5.2: BIO edges, empty docs, media-only docs, unicode)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from antnre_ray.sources.corpus import DOCUMENTS_SCHEMA, SPAN_STRUCT, synthesize_documents
from antnre_ray.stages.assemble import assemble_batch
from antnre_ray.stages.explode import mentions_batch, triples_batch
from antnre_ray.stages.sentencize import sentencize_batch
from antnre_ray.stages.validate import SchemaError, span_fingerprints, validate_batch


def mkdocs(rows: list[tuple[str, list[tuple[str, str, str, int]]]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in r[1]
                    ]
                    for r in rows
                ],
                pa.list_(SPAN_STRUCT),
            ),
        },
        schema=DOCUMENTS_SCHEMA,
    )


def test_validate_accepts_and_fingerprints():
    docs = mkdocs(
        [
            ("d1", [("text", "hello . ", "", 0), ("image", "", "media://img/1", 8)]),
            ("d2", []),
        ]
    )
    out = validate_batch(docs, partitions=4)
    assert out.column_names == ["doc_id", "spans", "span_fp", "part_id"]
    fps = out.column("span_fp").to_pylist()
    assert len(set(fps)) == 2 and all(len(f) == 16 for f in fps)
    # Fingerprint is content-determined: same spans → same fp.
    again = validate_batch(docs, partitions=4)
    assert again.column("span_fp").to_pylist() == fps
    # part_id deterministic and in range.
    parts = out.column("part_id").to_pylist()
    assert all(0 <= p < 4 for p in parts)
    assert validate_batch(docs, partitions=4).column("part_id").to_pylist() == parts


def test_validate_rejects_bad_schema():
    with pytest.raises(SchemaError):
        validate_batch(pa.table({"doc_id": pa.array(["x"])}))
    bad = pa.table(
        {"doc_id": pa.array(["x"]), "spans": pa.array([[1, 2]], pa.list_(pa.int32()))}
    )
    with pytest.raises(SchemaError):
        validate_batch(bad)
    # Decreasing offsets within a row.
    dec = mkdocs([("d", [("text", "a", "", 5), ("text", "b", "", 2)])])
    with pytest.raises(SchemaError):
        validate_batch(dec)


def test_validate_quarantine_mode(tmp_path):
    """Row-level quarantine: bad rows side-write with a reason, clean
    rows continue; strict mode still raises on the same input."""
    import pyarrow.parquet as pq

    good = mkdocs([("g1", [("text", "hello ", "", 0)]), ("g2", [("text", "world ", "", 0)])])
    dec = mkdocs([("bad1", [("text", "a", "", 5), ("text", "b", "", 2)])])
    batch = pa.concat_tables([good, dec])
    with pytest.raises(SchemaError):
        validate_batch(batch)
    qdir = str(tmp_path / "quarantine")
    out = validate_batch(batch, quarantine_dir=qdir)
    assert out.column("doc_id").to_pylist() == ["g1", "g2"]
    qfiles = list((tmp_path / "quarantine").glob("*.parquet"))
    assert len(qfiles) == 1
    q = pq.read_table(str(qfiles[0]))
    assert q.column("doc_id").to_pylist() == ["bad1"]
    assert q.column("reason").to_pylist() == ["decreasing_offsets"]
    # Idempotent retry: same batch → same file name, still one file.
    validate_batch(batch, quarantine_dir=qdir)
    assert list((tmp_path / "quarantine").glob("*.parquet")) == qfiles
    # A text span with NULL text (would crash assemble's join) is a
    # row-level violation too.
    nulltext = pa.table(
        {
            "doc_id": pa.array(["nt"]),
            "spans": pa.array(
                [[{"kind": "text", "text": None, "media_ref": "", "offset": 0}]],
                pa.list_(
                    pa.struct(
                        [("kind", pa.string()), ("text", pa.string()),
                         ("media_ref", pa.string()), ("offset", pa.int32())]
                    )
                ),
            ),
        }
    )
    with pytest.raises(SchemaError):
        validate_batch(nulltext)
    out2 = validate_batch(pa.concat_tables([good, nulltext]), quarantine_dir=qdir)
    assert out2.column("doc_id").to_pylist() == ["g1", "g2"]
    reasons = set()
    for f in (tmp_path / "quarantine").glob("*.parquet"):
        reasons.update(pq.read_table(str(f)).column("reason").to_pylist())
    assert "null_text_span" in reasons


def test_span_sequence_invariant_through_stages():
    """The spans column survives A2→A3 byte-identically on
    (kind, text, media_ref, order) — BASELINE.json:14."""
    docs, _ = synthesize_documents(32)
    before = span_fingerprints(docs.column("spans"))
    out = assemble_batch(validate_batch(docs))
    after = span_fingerprints(out.column("spans"))
    assert before == after
    assert out.column("doc_id").to_pylist() == docs.column("doc_id").to_pylist()


def test_assemble_concats_only_text_spans_in_order():
    docs = mkdocs(
        [
            (
                "d1",
                [
                    ("text", "alpha ", "", 0),
                    ("image", "", "media://img/x", 6),
                    ("text", "beta .", "", 7),
                ],
            ),
            ("d2", [("audio", "", "media://aud/y", 0)]),
            ("d3", []),
        ]
    )
    out = assemble_batch(validate_batch(docs))
    assert out.column("text").to_pylist() == ["alpha beta .", "", ""]


def test_sentencize_offsets_roundtrip():
    docs = mkdocs([("d1", [("text", "alice smith works for acme corp . bob jones lives in berlin .", "", 0)])])
    sent = sentencize_batch(assemble_batch(validate_batch(docs)))
    assert sent.num_rows == 2
    rows = sent.to_pylist()
    assert rows[0]["sent_id"] == 0 and rows[1]["sent_id"] == 1
    # Token offsets slice back to the token surfaces.
    for r in rows:
        for tok, off in zip(r["tokens"], r["tok_offsets"]):
            assert r["text"][off : off + len(tok)] == tok
    # sent_start traces into the doc text.
    doc_text = "alice smith works for acme corp . bob jones lives in berlin ."
    assert doc_text[rows[1]["sent_start"] :].startswith("bob jones")


def test_empty_and_media_only_docs_flow_through():
    docs = mkdocs([("e", []), ("m", [("image", "", "media://img/0", 0)])])
    sent = sentencize_batch(assemble_batch(validate_batch(docs)))
    assert sent.num_rows == 0  # no text → no sentences, no crash


def test_explode_mentions_and_triples():
    from antnre_ray.pipelines.flagship import reference_extractions

    docs, _ = synthesize_documents(16)
    ext = reference_extractions(docs)
    ments = mentions_batch(ext)
    tris = triples_batch(ext)
    assert {"doc_id", "start", "end", "ent_type", "surface", "score"} <= set(ments.column_names)
    # Every triple endpoint resolves to a well-formed span of its sentence.
    for r in tris.to_pylist():
        assert r["subj"]["start"] < r["subj"]["end"]
        assert r["pred"] in {"Work_For", "Live_In", "OrgBased_In", "Located_In", "Kill"}
        assert r["subj"]["surface"] and r["obj"]["surface"]


def test_unicode_surfaces_normalize():
    from antnre_ray.functions.normalize import normalize_one

    assert normalize_one("Ａlice  SMITH!") == "alice smith"
    assert normalize_one("  Acme–Corp. ") == "acme corp"
