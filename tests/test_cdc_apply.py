"""MERGE / compact-by-key — relational.b59_cdc_apply, b60_latest_by_key.

Both resolved against DuckDB references built from the same
deterministic derivations."""

from __future__ import annotations

import duckdb
import ray


def _con(sf001):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf001}/{t}.parquet')"
        )
    return con


def test_cdc_apply_matches_merge_sql(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b59_cdc_apply"]
    assert sql is not None
    rows = fn(sf001).take_all()
    ref = _con(sf001).execute(
        """
        WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        changes AS (
            SELECT doc_id, text || ' [rev2]' AS text, 0 AS op
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, NULL, 1
            FROM documents WHERE doc_id % 11 = 0 AND doc_id % 3 <> 0
        )
        SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
               COALESCE(c.text, b.text) AS text
        FROM base b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id
        WHERE COALESCE(c.op, 0) = 0
        ORDER BY doc_id
        """
    ).fetchall()
    assert [(r["doc_id"], r["text"]) for r in rows] == ref


def test_cdc_apply_semantics(ray_session, sf001):
    """Spot-check the three MERGE cases on real ids."""
    from antnre_ray.pipelines.registry import load_all

    fn, _ = load_all()["b59_cdc_apply"]
    got = {r["doc_id"]: r["text"] for r in fn(sf001).take_all()}
    base_ids = {
        r[0]
        for r in _con(sf001).execute("SELECT doc_id FROM documents").fetchall()
    }
    for did in sorted(base_ids)[:500]:
        if did % 3 == 0:
            assert got[did].endswith(" [rev2]"), did  # upsert (incl. insert when %7==0)
        elif did % 11 == 0:
            assert did not in got, did  # deleted
        elif did % 7 == 0:
            assert did not in got, did  # never in base, no change row
        else:
            assert did in got and not got[did].endswith(" [rev2]"), did


def test_latest_by_key_matches_window_sql(ray_session, sf001):
    from antnre_ray.pipelines.registry import load_all

    fn, sql = load_all()["b60_latest_by_key"]
    assert sql is not None
    rows = fn(sf001).take_all()
    ref = _con(sf001).execute(
        """
        SELECT user_id, ts, event_id, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn FROM events
        ) WHERE rn = 1 ORDER BY user_id
        """
    ).fetchall()
    assert len(rows) == len(ref)
    for r, (uid, ts, eid, val) in zip(rows, ref):
        assert (r["user_id"], r["event_id"]) == (uid, eid)
        assert r["ts"] == ts and r["value"] == val
