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
