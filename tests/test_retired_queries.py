"""Queries retired from the 50-slot driver registry stay exercised here.

Each retirement freed a slot for a new oracle-paired operator; the retired
shape's correctness is still covered — transitively by a surviving oracle
where noted, and directly against DuckDB on the test fixture here.
"""

from __future__ import annotations

import duckdb

from vector_search_ai_assistant_mongodbvcore_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("events", "documents", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_events_hourly_rollup_matches_duckdb(spark):
    """Retired r7 (slot -> training_shards); oracle was identical SQL to
    windowed_event_counts, still hash-gated there."""
    got = {
        (r.hour.isoformat(), r.event_type): (r.n, round(r.total_value, 2))
        for r in Q.events_hourly_rollup(spark, SF).collect()
    }
    want = {
        (h.isoformat(), et): (n, round(tv, 2))
        for h, et, n, tv in _duck(
            """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
                      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
               FROM events GROUP BY 1, 2"""
        )
    }
    assert got == want


def test_key_lookup_matches_duckdb_and_pushes_filter(spark):
    """Retired r7 (slot -> contamination_sources); equality-pushed-filter
    shape subsumed by events_conjunctive_filter + latest_order_lookup."""
    df = Q.key_lookup(spark, SF)
    got = [tuple(r) for r in df.collect()]
    want = [
        (eid, ts, u, et, v)
        for eid, ts, u, et, v in _duck(
            "SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id = 4242"
        )
    ]
    assert [(g[0], g[2], g[3]) for g in got] == [(w[0], w[2], w[3]) for w in want]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_id), EqualTo(event_id,4242)]" in plan


def test_simhash_fingerprints_match_duckdb(spark):
    """Retired r7 (slot -> duplicated_ngram_stats); fingerprint shape still
    gated by rolling_fingerprints, bit recurrence pinned here against the
    former registry oracle SQL."""
    got = {r.doc_id: r.simhash for r in Q.simhash_fingerprints(spark, SF).collect()}
    want = dict(_duck(Q.SIMHASH_SQL))
    assert got == want
