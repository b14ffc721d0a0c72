"""Column profiling operator (operators/profile.py) vs numpy/DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from vector_search_ai_assistant_mongodbvcore_spark.operators.profile import column_profile

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_profile(spark, tables):
    rows = column_profile(tables["events"]).collect()
    return {r["column"]: r for r in rows}


def test_counts_match_duckdb(events_profile):
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(value), count(*) - count(value), count(DISTINCT user_id)
            FROM '{SF}/events.parquet'"""
    ).fetchone()
    assert events_profile["value"]["n_nonnull"] == want[0]
    assert events_profile["value"]["n_null"] == want[1]
    assert events_profile["user_id"]["n_distinct"] == want[2]


def test_percentiles_match_numpy(events_profile):
    con = duckdb.connect()
    vals = np.array(
        [r[0] for r in con.execute(
            f"SELECT value FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
        ).fetchall()]
    )
    got = events_profile["value"]["percentiles"]
    want = np.percentile(vals, [25, 50, 75], method="linear")
    assert got == pytest.approx(list(want), rel=1e-12)


def test_non_numeric_has_no_percentiles_but_minmax(events_profile):
    et = events_profile["event_type"]
    assert et["percentiles"] is None
    assert isinstance(et["min"], str) and isinstance(et["max"], str)
    assert et["min"] <= et["max"]


def test_complex_columns_skipped(spark, tables):
    rows = column_profile(tables["embeddings"]).collect()
    assert all(r["column"] != "embedding" for r in rows)  # array col skipped
    with pytest.raises(ValueError):
        column_profile(tables["embeddings"].select("embedding"))


def test_single_scan_plan(spark, tables):
    df = column_profile(tables["events"], columns=["value", "user_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_approx_mode_runs(spark, tables):
    rows = column_profile(tables["events"], columns=["user_id"], approx_distinct=True).collect()
    exact = column_profile(tables["events"], columns=["user_id"]).collect()
    # HLL within 5% of exact at this cardinality
    assert rows[0]["n_distinct"] == pytest.approx(exact[0]["n_distinct"], rel=0.05)


def test_approx_percentiles_bounded_sketch(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.profile import column_profile

    ev = tables["events"]
    exact = {
        r.column: r.percentiles
        for r in column_profile(ev, columns=["value"]).collect()
    }
    approx = {
        r.column: r.percentiles
        for r in column_profile(
            ev, columns=["value"], approx_percentiles=True
        ).collect()
    }
    # same schema either way; at accuracy=10000 over 1000 rows the sketch
    # rank error is < 1 row, so quantiles land on real data values near
    # the exact interpolated ones
    ex, ap = exact["value"], approx["value"]
    assert len(ex) == len(ap) == 3
    import numpy as np

    vals = np.array([r.value for r in ev.select("value").collect()])
    spread = vals.max() - vals.min()
    for e, a in zip(ex, ap):
        assert abs(e - a) <= spread * 0.02
