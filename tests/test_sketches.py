"""KMV distinct-cardinality sketch (operators/sketches.py): estimator
accuracy, the lossless per-partition reduce, the exact-below-k regime,
NULL semantics, merge composability, and DuckDB bit-parity of the
portable hash + estimator arithmetic."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
    kmv_distinct,
    kmv_hash,
    kmv_merge,
    kmv_profile,
    kmv_smallest,
)


def test_hash_matches_duckdb_bit_for_bit(spark):
    """The 60-bit portable hash: Spark conv(substr(md5)) == DuckDB
    CAST('0x' || substr(md5) AS UBIGINT) on the same rendered values."""
    vals = ["hello", "a", "", "42", "naïve ünïcode", "multi word text"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", kmv_hash(F.col("v")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            "SELECT CAST('0x' || substr(md5('kmv:' || ?), 1, 15) AS UBIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_below_k_regime_is_exact(spark):
    """Cardinality < k: the sketch IS the distinct set, the estimate is
    the exact count as an integral double."""
    df = spark.range(0, 1000).select((F.col("id") % 37).alias("v"))
    est = kmv_distinct(df, "v", k=256).collect()[0]["approx_distinct"]
    assert est == 37.0


def test_estimator_within_error_bound(spark):
    """Sketch regime: n distinct >> k. The (k-1)/U_(k) estimator has
    stddev ~ n/sqrt(k-2) (~6.3% at k=256); the fixed hash makes the
    realized error deterministic — assert a 4-sigma envelope so the
    test pins accuracy without pinning one magic value."""
    n = 20_000
    df = spark.range(0, n).select(F.col("id").alias("v"))
    est = kmv_distinct(df, "v", k=256).collect()[0]["approx_distinct"]
    assert abs(est - n) / n < 4 / (254**0.5)  # < ~25%


def test_duplicates_do_not_move_the_estimate(spark):
    """The sketch sees hashes, not rows: massive duplication of the same
    values yields the identical sketch and estimate."""
    base = spark.range(0, 5000).select(F.col("id").alias("v"))
    dup = base.unionByName(base).unionByName(base)
    e1 = kmv_distinct(base, "v", k=128).collect()[0]["approx_distinct"]
    e2 = kmv_distinct(dup, "v", k=128).collect()[0]["approx_distinct"]
    assert e1 == e2


def test_partition_reduce_is_lossless(spark):
    """kmv_smallest's per-partition bounded reduce must equal the plain
    global DISTINCT-sort-limit over the hashed column, for any
    partitioning of the input."""
    df = spark.range(0, 8000).select(F.col("id").alias("v"))
    for parts in (1, 7, 32):
        sk = kmv_smallest(df.repartition(parts), "v", k=64)
        plain = (
            df.select(kmv_hash(F.col("v")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(64)
        )
        assert [r["h"] for r in sk.collect()] == [r["h"] for r in plain.collect()]


def test_nulls_are_excluded(spark):
    """COUNT(DISTINCT) semantics: NULL never contributes a hash."""
    df = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,), ("a",)], "v string"
    )
    est = kmv_distinct(df, "v", k=16).collect()[0]["approx_distinct"]
    assert est == 2.0


def test_merge_equals_sketch_of_union(spark):
    """KMV composability: merging two datasets' sketches equals the
    sketch of their union — the property that lets per-shard profiling
    answer union cardinalities without a rescan."""
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(1500, 4500).select(F.col("id").alias("v"))
    merged = kmv_merge([kmv_smallest(a, "v", k=64), kmv_smallest(b, "v", k=64)], k=64)
    whole = kmv_smallest(a.unionByName(b), "v", k=64)
    assert [r["h"] for r in merged.collect()] == [r["h"] for r in whole.collect()]


def test_k_below_two_raises(spark):
    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_smallest(df, "v", k=1)


def test_profile_row_shape_and_exact_column(spark, tables):
    """kmv_profile: entity label, estimate, exact count, relative error —
    and the exact column agrees with a direct countDistinct."""
    row = kmv_profile(tables["events"], "user_id", k=256, entity="events.user_id").collect()[0]
    exact = tables["events"].agg(F.count_distinct("user_id")).collect()[0][0]
    assert row["entity"] == "events.user_id"
    assert row["exact_distinct"] == exact
    assert row["approx_distinct"] == float(exact)  # below-k regime here
    assert row["rel_err_pct"] == 0.0


def test_sketch_plan_is_bounded_not_full_distinct(spark):
    """The scale claim, plan-asserted: the sketch path's only wide stage
    runs over the per-partition-reduced (<= P*k rows) frame — the
    MapInPandas reduce sits BELOW the exchange, so the shuffle never
    carries the raw distinct set."""
    df = spark.range(0, 50_000).select(F.col("id").alias("v")).repartition(8)
    sk = kmv_smallest(df, "v", k=64)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # the reduce feeds the exchange: MapInPandas appears under (after, in
    # bottom-up print order) the first Exchange in the string
    assert "MapInPandas" in plan
    map_pos = plan.index("MapInPandas")
    exch_pos = plan.index("Exchange")
    assert exch_pos < map_pos, "per-partition reduce must run before the shuffle"


def test_many_matches_single_column_sketches(spark, tables):
    """kmv_smallest_many == kmv_smallest per column — the single-scan
    multi-column form changes the pass structure, never the sketch."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
        kmv_smallest_many,
    )

    df = tables["lineitem"]
    many = kmv_smallest_many(df, ["l_orderkey", "l_partkey"], k=64)
    got = {
        c: [r["h"] for r in many.filter(F.col("col") == c).orderBy("h").collect()]
        for c in ("l_orderkey", "l_partkey")
    }
    for c in ("l_orderkey", "l_partkey"):
        want = [r["h"] for r in kmv_smallest(df, c, k=64).collect()]
        assert got[c] == want, c


def test_profile_many_matches_profile_rows(spark, tables):
    """kmv_profile_many rows == the per-column kmv_profile rows, with
    entity_prefix naming."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
        kmv_profile_many,
    )

    df = tables["events"]
    many = {
        r["entity"]: (r["approx_distinct"], r["exact_distinct"], r["rel_err_pct"])
        for r in kmv_profile_many(
            df, ["user_id", "event_type"], k=256, entity_prefix="events"
        ).collect()
    }
    for c in ("user_id", "event_type"):
        one = kmv_profile(df, c, k=256, entity=f"events.{c}").collect()[0]
        assert many[f"events.{c}"] == (
            one["approx_distinct"],
            one["exact_distinct"],
            one["rel_err_pct"],
        )


def test_many_handles_mixed_nulls_per_column(spark):
    """A row NULL in one profiled column and present in another: nullness
    is per column, never a row filter; an all-NULL column still reports
    (0.0, 0, NULL rel err) instead of vanishing."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
        kmv_profile_many,
        kmv_smallest_many,
    )

    df = spark.createDataFrame(
        [(1, None, None), (None, "x", None), (2, "x", None), (2, None, None)],
        "a int, b string, c int",
    )
    sk = kmv_smallest_many(df, ["a", "b", "c"], k=8)
    counts = {r["col"]: r["n"] for r in sk.groupBy("col").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"a": 2, "b": 1}  # c: all NULL -> no sketch rows
    prof = {
        r["entity"]: (r["approx_distinct"], r["exact_distinct"], r["rel_err_pct"])
        for r in kmv_profile_many(df, ["a", "b", "c"], k=8).collect()
    }
    assert prof["a"] == (2.0, 2, 0.0)
    assert prof["b"] == (1.0, 1, 0.0)
    assert prof["c"] == (0.0, 0, None)


def test_many_preserves_full_60bit_precision_with_nulls(spark):
    """Regression: NULLs in the hashed column must not downgrade the
    Arrow transfer to float64 (53-bit mantissa) — hashes above 2^53 must
    survive the multi-column reduce bit-exact. The NULL sentinel (-1,
    outside the hash domain) keeps the column int64 end to end."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
        kmv_smallest_many,
    )

    vals = [(str(i),) for i in range(200)] + [(None,)] * 50
    df = spark.createDataFrame(vals, "v string")
    many = [r["h"] for r in kmv_smallest_many(df, ["v"], k=200).orderBy("h").collect()]
    single = [r["h"] for r in kmv_smallest(df, "v", k=200).collect()]
    assert any(h > 2**53 for h in single)  # the case exercises big hashes
    assert many == single


def test_hierarchical_fold_lossless_and_gated(spark):
    """r16 two-level partial fold (guide §5): past _FOLD_CUTOVER the
    <= P*k local partials are folded per (col, pmod(h, G)) group before
    the final per-column cut, so no single task buffers all P*k longs.
    Pins (a) bit-parity of sketch rows and profile rows between a
    low-partition input (gate OFF, one-level merge) and the same data
    forced through many partitions (gate ON, two-level fold), and
    (b) the gate itself via the plan: the folded plan carries the extra
    pmod grouping, the un-folded plan does not."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators import sketches as SK

    vals = [(str(i), str(i % 37)) for i in range(3000)]
    low = spark.createDataFrame(vals, "a string, b string").coalesce(2)
    # trip the gate at test scale by shrinking the cutover instead of
    # spawning _FOLD_CUTOVER/k real partitions (8k+ tasks at local[4])
    k = 16
    high = spark.createDataFrame(vals, "a string, b string").repartition(24)
    import unittest.mock as _mock

    with _mock.patch.object(SK, "_FOLD_CUTOVER", 256):
        assert not SK._fold_worthwhile(low, k, 2)
        assert SK._fold_worthwhile(high, k, 2)

    with _mock.patch.object(SK, "_FOLD_CUTOVER", 256):
        rows_high = sorted(tuple(r) for r in SK.kmv_smallest_many(high, ["a", "b"], k=k).collect())
        prof_high = sorted(tuple(r) for r in SK.kmv_profile_many(high, ["a", "b"], k=k).collect())
        single_high = sorted(r.h for r in SK.kmv_smallest(high, "a", k=k).collect())
        folded_plan = SK.kmv_profile_many(high, ["a", "b"], k=k)._jdf.queryExecution().toString()
    rows_low = sorted(tuple(r) for r in SK.kmv_smallest_many(low, ["a", "b"], k=k).collect())
    prof_low = sorted(tuple(r) for r in SK.kmv_profile_many(low, ["a", "b"], k=k).collect())
    single_low = sorted(r.h for r in SK.kmv_smallest(low, "a", k=k).collect())
    plain_plan = SK.kmv_profile_many(low, ["a", "b"], k=k)._jdf.queryExecution().toString()

    assert rows_low == rows_high
    assert prof_low == prof_high
    assert single_low == single_high
    assert "pmod" in folded_plan
    assert "pmod" not in plain_plan
