"""Prepared-plan cache (queries._prepared): pins the r15 contract that
memoized registry queries are PURE PLAN-BUILDERS.

The cache re-serves a constructed DataFrame per (session, sf_dir) — an
immutable lazy plan, so results are never cached. That is only sound
when construction itself runs no Spark jobs: a query that fits, probes,
or writes while constructing must be excluded (_EAGER_CONSTRUCT) so
every invocation re-runs that work. These tests make the classification
a suite failure instead of a silent drift (tools/construct_jobs.py is
the measurement twin).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from vector_search_ai_assistant_mongodbvcore_spark import queries as Q

import bench


def _next_job_id(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def test_memoized_construct_runs_zero_jobs(spark):
    """Every memoized bench query must construct without running a DAG
    job (second construction — the first warms model fits and table
    handles, memoized independently)."""
    reg = {name: fn for name, (fn, _) in Q.REGISTRY.items()}
    offenders = {}
    for name in bench.BENCH_QUERIES:
        if name in Q._EAGER_CONSTRUCT:
            continue
        reg[name](spark, SF_DIR)  # warm
        before = _next_job_id(spark)
        reg[name](spark, SF_DIR)
        ran = _next_job_id(spark) - before
        if ran:
            offenders[name] = ran
    assert not offenders, (
        f"queries run Spark jobs during construction but are not in "
        f"_EAGER_CONSTRUCT (move them there or make construction lazy): "
        f"{offenders}"
    )


def test_prepared_cache_reserves_same_plan(spark):
    """Memoized queries return the SAME DataFrame object per (session,
    sf_dir) — the prepared statement — while eager-construct queries
    build fresh every call."""
    reg = Q.queries()
    assert reg["pricing_summary"](spark, SF_DIR) is reg["pricing_summary"](
        spark, SF_DIR
    )
    assert reg["source_capped_sample"](spark, SF_DIR) is not reg[
        "source_capped_sample"
    ](spark, SF_DIR)


def test_prepared_cache_is_keyed_by_sf_dir(spark):
    reg = Q.queries()
    a = reg["events_conjunctive_filter"](spark, SF_DIR)
    b = reg["events_conjunctive_filter"](spark, "/root/testdata/sf0.01")
    assert a is not b


def test_prepared_plan_still_executes_from_parquet(spark):
    """The prepared plan is lazy: two executions of the same memoized
    DataFrame both produce the full result (nothing is frozen at
    construct time)."""
    reg = Q.queries()
    df = reg["events_conjunctive_filter"](spark, SF_DIR)
    first = df.count()
    assert df is reg["events_conjunctive_filter"](spark, SF_DIR)
    assert df.count() == first > 0
