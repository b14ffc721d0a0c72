"""Misra-Gries heavy hitters (operators/sketches.mg_candidates /
top_frequent): the mergeable-summaries superset guarantee (every item
with true frequency > n/(k+1) survives as a candidate), exact top-N
parity with the full groupBy under both the certified sketch path and
the uncertified fallback, lower-bound counts, and tie determinism."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
    mg_candidates,
    top_frequent,
)


def _df(spark, values, parts=8):
    return spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(parts)


def _exact_topn(values, topn):
    c = Counter(v for v in values if v is not None)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]


def _zipfish(seed, n=4000, n_heavy=8, n_tail=600):
    rng = random.Random(seed)
    vals = []
    for i in range(n):
        if rng.random() < 0.6:
            vals.append(f"heavy{rng.randrange(n_heavy)}")
        else:
            vals.append(f"tail{rng.randrange(n_tail)}")
    return vals


def test_candidates_superset_of_true_heavy_hitters(spark):
    """The theorem itself, over several seeds: every item whose true
    count exceeds n/(k+1) appears in mg_candidates."""
    k = 32
    for seed in (1, 2, 3):
        vals = _zipfish(seed)
        got = {r["item"] for r in mg_candidates(_df(spark, vals), "item", k).collect()}
        counts = Counter(vals)
        bound = len(vals) / (k + 1)
        must_survive = {v for v, c in counts.items() if c > bound}
        assert must_survive, "fixture should have heavy items above the bound"
        assert must_survive <= got, seed


def test_mg_counts_are_lower_bounds_within_error(spark):
    k = 32
    vals = _zipfish(7)
    counts = Counter(vals)
    n = len(vals)
    rows = mg_candidates(_df(spark, vals), "item", k).collect()
    assert rows and all(r["n_rows"] == n for r in rows)
    for r in rows:
        true = counts[r["item"]]
        assert r["mg_count"] <= true  # never overestimates
        assert true - r["mg_count"] <= n / (k + 1) + 1e-9  # bounded under


def test_top_frequent_exact_certified_path(spark):
    """Skewed data, generous k: the sketch path must return the exact
    top-N (values AND counts), ordered (cnt desc, item asc)."""
    vals = _zipfish(11)
    got = [
        (r["item"], r["cnt"])
        for r in top_frequent(_df(spark, vals), "item", topn=8, k=256).collect()
    ]
    assert got == _exact_topn(vals, 8)


def test_top_frequent_exact_on_uncertified_fallback(spark):
    """Near-uniform data with k far too small: the certificate cannot
    hold, and the fallback full aggregation must still be exact."""
    rng = random.Random(5)
    vals = [f"u{rng.randrange(300)}" for _ in range(2000)]
    got = [
        (r["item"], r["cnt"])
        for r in top_frequent(_df(spark, vals), "item", topn=5, k=4).collect()
    ]
    assert got == _exact_topn(vals, 5)


def test_top_frequent_tie_break_is_item_ascending(spark):
    vals = ["b"] * 10 + ["a"] * 10 + ["c"] * 3
    got = [
        (r["item"], r["cnt"])
        for r in top_frequent(_df(spark, vals, parts=3), "item", topn=3, k=64).collect()
    ]
    assert got == [("a", 10), ("b", 10), ("c", 3)]


def test_fewer_distinct_than_topn_and_nulls(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), (None,), ("y",), (None,)], "item string"
    ).repartition(4)
    got = [(r["item"], r["cnt"]) for r in top_frequent(df, "item", topn=10, k=64).collect()]
    assert got == [("x", 2), ("y", 1)]  # nulls excluded, both items exact


def test_empty_and_all_null_inputs(spark):
    empty = spark.createDataFrame([], "item string")
    assert top_frequent(empty, "item", topn=3, k=16).collect() == []
    allnull = spark.createDataFrame([(None,), (None,)], "item string")
    assert top_frequent(allnull, "item", topn=3, k=16).collect() == []
    assert mg_candidates(allnull, "item", 16).collect() == []


def test_candidates_merge_across_partitions(spark):
    """One item spread thin across many partitions (never locally
    dominant) must still surface when globally heavy."""
    # 12 partitions; "needle" appears 30x in each (360 total of 1560)
    vals = []
    rng = random.Random(13)
    for _ in range(12):
        part = ["needle"] * 30 + [f"noise{rng.randrange(500)}" for _ in range(100)]
        vals.extend(part)
    k = 16
    got = {r["item"]: r["mg_count"] for r in mg_candidates(_df(spark, vals, parts=12), "item", k).collect()}
    assert "needle" in got
    top = top_frequent(_df(spark, vals, parts=12), "item", topn=1, k=256).collect()
    assert top[0]["item"] == "needle" and top[0]["cnt"] == 360


def test_non_string_column_casts(spark):
    df = spark.range(0, 1000).select((F.col("id") % 7).alias("item"))
    got = [(r["item"], r["cnt"]) for r in top_frequent(df, "item", topn=2, k=64).collect()]
    # 1000 = 7*142 + 6: residues 0..5 get 143, residue 6 gets 142
    assert got == [("0", 143), ("1", 143)]
