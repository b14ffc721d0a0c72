"""Declarative data-quality contracts (operators/contracts.py): metric
semantics per constraint kind, the pinned empty-input conventions, the
one-scan compilation claim, and rule-name purity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import (
    check,
    completeness,
    compliance,
    max_between,
    mean_between,
    min_between,
    row_count,
    rule_name,
    uniqueness,
)


def _by_rule(df):
    return {r["constraint"]: (r["metric"], r["passed"]) for r in df.collect()}


def test_completeness_fraction(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "v string")
    got = _by_rule(check(df, [completeness("v", 0.5), completeness("v", 0.9)]))
    assert got["completeness(v) >= 0.5"] == (0.5, True)
    assert got["completeness(v) >= 0.9"] == (0.5, False)


def test_uniqueness_over_nonnull(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "v int")
    m, p = _by_rule(check(df, [uniqueness("v", 1.0)]))["uniqueness(v) >= 1.0"]
    assert m == 2 / 3 and p is False
    key = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    m, p = _by_rule(check(key, [uniqueness("v", 1.0)]))["uniqueness(v) >= 1.0"]
    assert m == 1.0 and p is True


def test_compliance_null_predicate_is_noncompliant(spark):
    df = spark.createDataFrame([(5,), (-1,), (None,)], "v int")
    m, p = _by_rule(check(df, [compliance("v > 0", 0.5)]))[
        "compliance(v > 0) >= 0.5"
    ]
    assert m == pytest.approx(1 / 3) and p is False


def test_row_count_bounds(spark):
    df = spark.range(10)
    got = _by_rule(
        check(df, [row_count(5, 20), row_count(11, None), row_count(1, 9)])
    )
    assert got["row_count in [5, 20]"] == (10.0, True)
    assert got["row_count >= 11"] == (10.0, False)
    assert got["row_count in [1, 9]"] == (10.0, False)


def test_mean_min_max_between(spark):
    df = spark.createDataFrame([(1.5,), (2.5,), (None,)], "v double")
    got = _by_rule(
        check(
            df,
            [mean_between("v", 1.0, 3.0), min_between("v", 1.0, 2.0), max_between("v", 3.0, 9.0)],
        )
    )
    assert got["mean(v) in [1.0, 3.0]"] == (2.0, True)
    assert got["min(v) in [1.0, 2.0]"] == (1.5, True)
    assert got["max(v) in [3.0, 9.0]"] == (2.5, False)


def test_empty_input_conventions(spark):
    """Fractions are vacuously true on an empty dataset; row_count
    minimums and value-range expectations fail (absent signal is not a
    passing one)."""
    empty = spark.createDataFrame([], "v int")
    got = _by_rule(
        check(
            empty,
            [
                completeness("v", 1.0),
                uniqueness("v", 1.0),
                compliance("v > 0", 1.0),
                row_count(1, None),
                mean_between("v", 0.0, 10.0),
            ],
        )
    )
    assert got["completeness(v) >= 1.0"] == (1.0, True)
    assert got["uniqueness(v) >= 1.0"] == (1.0, True)
    assert got["compliance(v > 0) >= 1.0"] == (1.0, True)
    assert got["row_count >= 1"] == (0.0, False)
    m, p = got["mean(v) in [0.0, 10.0]"]
    assert m is None and p is False


def test_whole_contract_is_one_scan(spark, tables):
    """The compilation claim: N constraints over a parquet table plan
    exactly ONE scan of it (count_distinct adds an Expand, never a second
    scan), with partial aggregation below the exchange."""
    cons = [
        completeness("o_custkey", 1.0),
        uniqueness("o_orderkey", 1.0),
        compliance("o_totalprice > 0", 1.0),
        row_count(1, None),
        mean_between("o_totalprice", 0.0, 1e9),
    ]
    out = check(tables["orders"], cons)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert out.count() == len(cons)


def test_empty_constraint_list_raises(spark):
    with pytest.raises(ValueError, match="at least one constraint"):
        check(spark.range(1), [])


def test_rule_name_matches_live_constraints():
    """rule_name (pure, Spark-free) names rules identically to the live
    factories — the property the DuckDB oracle generator leans on."""
    assert rule_name("completeness", "c", 0.9) == "completeness(c) >= 0.9"
    assert rule_name("row_count", 5, None) == "row_count >= 5"
    assert rule_name("row_count", 5, 9) == "row_count in [5, 9]"
    assert rule_name("mean_between", "c", 1.0, 2.0) == "mean(c) in [1.0, 2.0]"
    with pytest.raises(ValueError, match="unknown constraint kind"):
        rule_name("nope")


def test_live_constraint_names_route_through_rule_name(spark):
    cons = [
        completeness("v", 1.0),
        uniqueness("v", 0.5),
        compliance("v > 0", 0.75),
        row_count(1, 2),
        mean_between("v", 0.0, 1.0),
        min_between("v", 0.0, 1.0),
        max_between("v", 0.0, 1.0),
    ]
    assert [c.name for c in cons] == [
        "completeness(v) >= 1.0",
        "uniqueness(v) >= 0.5",
        "compliance(v > 0) >= 0.75",
        "row_count in [1, 2]",
        "mean(v) in [0.0, 1.0]",
        "min(v) in [0.0, 1.0]",
        "max(v) in [0.0, 1.0]",
    ]


def test_compare_reports_drift_semantics(spark):
    """Report-over-report drift (the Deequ anomaly-detection shape):
    within-tolerance moves pass, beyond-tolerance drift, zero baselines
    use the absolute rule, appeared/disappeared rules always drift, and
    NULL metrics drift only one-sided."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import (
        compare_reports,
    )

    def report(rows):
        return spark.createDataFrame(
            rows, "constraint string, metric double, passed boolean"
        )

    base = report(
        [
            ("complete", 1.0, True),
            ("mean", 100.0, True),
            ("zero", 0.0, True),
            ("gone", 0.5, True),
            ("null_both", None, False),
            ("null_then_value", None, False),
        ]
    )
    cur = report(
        [
            ("complete", 0.98, True),   # -2% < 5% tolerance -> ok
            ("mean", 80.0, False),      # -20% -> drift
            ("zero", 0.0, True),        # zero baseline, unchanged -> ok
            ("new", 1.0, True),         # appeared -> drift
            ("null_both", None, False),         # NULL == NULL -> ok
            ("null_then_value", 3.0, True),     # NULL -> value -> drift
        ]
    )
    got = {
        r["rule"]: (r["drifted"], r["delta"])
        for r in compare_reports(cur, base, max_rel_delta=0.05).collect()
    }
    assert got["complete"] == (False, pytest.approx(-0.02))
    assert got["mean"] == (True, -20.0)
    assert got["zero"] == (False, 0.0)
    assert got["new"][0] is True and got["new"][1] is None
    assert got["gone"][0] is True and got["gone"][1] is None
    assert got["null_both"] == (False, None)
    assert got["null_then_value"] == (True, None)
    # absolute tolerance clears what the relative one would flag
    got_abs = {
        r["rule"]: r["drifted"]
        for r in compare_reports(cur, base, max_rel_delta=0.05, max_abs_delta=25.0).collect()
    }
    assert got_abs["mean"] is False  # |delta| = 20 <= 25
