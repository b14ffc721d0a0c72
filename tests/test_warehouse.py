"""Bucketed warehouse tables (sources/warehouse.py): co-located joins and
aggregations skip their shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.sources.warehouse import (
    read_table,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tables):
    save_bucketed(tables["orders"], "wh_orders", "o_custkey", buckets=8)
    save_bucketed(
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "wh_customer", "o_custkey", buckets=8,
    )
    yield
    for t in ("wh_orders", "wh_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "wh_orders").join(
            read_table(spark, "wh_customer"), "o_custkey"
        )
        plan = _plan(j)
        assert "Exchange" not in plan  # both sides pre-shuffled at write time
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = read_table(spark, "wh_orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg)


def test_unbucketed_join_needs_exchanges(spark, tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = tables["orders"].join(
            tables["customer"].withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        )
        assert "Exchange" in _plan(j)  # the cost bucketing removes
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_unbucketed(spark, tables, bucketed):
    a = (
        read_table(spark, "wh_orders")
        .join(read_table(spark, "wh_customer"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = (
        tables["orders"]
        .join(tables["customer"].withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
