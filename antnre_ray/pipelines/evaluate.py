"""A20 — CoNLL04-style triple scorer (the P/R≥0.95 gate, BASELINE.json:2).

A predicted triple is correct iff subject span, object span (exact
token boundaries + entity type) and predicate all match a gold triple
in the same (doc_id, sent_id) — exact-span, exact-type micro P/R/F1,
the CoNLL04 convention (upstream eval module, UNVERIFIED — SURVEY.md §0).

Small-data implementation is set-based on the driver; at 100 TB the same
keys become a hash semi-join (TP) and two anti-joins (FP/FN) — see
SURVEY.md A20.
"""

from __future__ import annotations

import pyarrow as pa


def triple_keys(triples: pa.Table) -> set[tuple]:
    """Key set for exploded triples (stages/explode.triples_batch schema)."""
    d = triples.to_pydict()
    return {
        (
            d["doc_id"][i],
            d["sent_id"][i],
            d["subj"][i]["start"],
            d["subj"][i]["end"],
            d["subj"][i]["ent_type"],
            d["pred"][i],
            d["obj"][i]["start"],
            d["obj"][i]["end"],
            d["obj"][i]["ent_type"],
        )
        for i in range(triples.num_rows)
    }


def gold_triple_keys(gold: pa.Table) -> set[tuple]:
    """Key set for the gold-annotation fixture (FIXTURES.md F2 schema)."""
    d = gold.to_pydict()
    keys = set()
    for i in range(gold.num_rows):
        ents = d["entities"][i]
        for rel in d["relations"][i]:
            s = ents[rel["subj_idx"]]
            o = ents[rel["obj_idx"]]
            keys.add(
                (
                    d["doc_id"][i],
                    d["sent_id"][i],
                    s["start"],
                    s["end"],
                    s["ent_type"],
                    rel["pred"],
                    o["start"],
                    o["end"],
                    o["ent_type"],
                )
            )
    return keys


def prf(pred_keys: set[tuple], gold_keys: set[tuple]) -> dict[str, float]:
    tp = len(pred_keys & gold_keys)
    fp = len(pred_keys - gold_keys)
    fn = len(gold_keys - pred_keys)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}
