"""Deterministic train/val/test splits (operators/splits.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
    assign_split,
    assign_split_stratified,
    split_bucket,
)


def _py_bucket(seed: int, doc_id) -> int:
    return int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:8], 16)


def test_split_bucket_matches_python_md5(spark, tables):
    rows = (
        tables["documents"]
        .select("doc_id", split_bucket(F.col("doc_id"), seed=42).alias("b"))
        .collect()
    )
    assert rows, "documents fixture is empty"
    for r in rows:
        assert r.b == _py_bucket(42, r.doc_id)


def test_assign_split_deterministic_total_and_disjoint(spark, tables):
    docs = tables["documents"]
    out = assign_split(docs, "doc_id", seed=42)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()  # complete: every row labeled
    assert set(counts) <= {"train", "val", "test"}
    # deterministic across invocations and independent of row order
    again = assign_split(docs.orderBy(F.desc("doc_id")), "doc_id", seed=42)
    assert out.select("doc_id", "split").subtract(again.select("doc_id", "split")).count() == 0
    # a different seed moves documents between splits
    other = assign_split(docs, "doc_id", seed=7)
    assert out.select("doc_id", "split").subtract(other.select("doc_id", "split")).count() > 0


def test_assign_split_proportions_in_expectation(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # hash split: binomial tolerance, generous for a small fixture
    assert abs(counts.get("train", 0) / n - 0.8) < 0.15
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_assign_split_stratified_exact_per_stratum(spark, tables):
    docs = tables["documents"]
    out = assign_split_stratified(docs, "doc_id", "lang", {"train": 0.8, "val": 0.1, "test": 0.1})
    per = (
        out.groupBy("lang")
        .pivot("split", ["train", "val", "test"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
        .collect()
    )
    assert per
    for r in per:
        n = r.train + r.val + r.test
        # boundaries are floor(n * cumweight): train == floor(0.8n),
        # train+val == floor(0.9n), test takes the remainder
        assert r.train == int(n * 0.8)
        assert r.train + r.val == int(n * 0.9)
    # same rows, same labels on re-run (window is ordered by (bucket, id))
    again = assign_split_stratified(docs, "doc_id", "lang", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").subtract(again.select("doc_id", "split")).count() == 0


def test_split_weight_validation(spark, tables):
    docs = tables["documents"]
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", {"train": 0.5, "test": 0.4})  # sums to 0.9
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", {"train": 1.2, "test": -0.2})
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", {})


def test_single_split_takes_everything(spark, tables):
    docs = tables["documents"]
    out = assign_split(docs, "doc_id", {"all": 1.0})
    assert out.filter(F.col("split") != "all").count() == 0


def test_assign_split_plan_is_narrow(spark, tables):
    """The hash split must add NO shuffle: at 100 TB it is a free column."""
    plan = assign_split(tables["documents"], "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---- sample_by_rates -------------------------------------------------------


def test_sample_by_rates_deterministic_and_nested(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import sample_by_rates

    docs = tables["documents"]
    a = {r["doc_id"] for r in sample_by_rates(docs, "source", {"src0": 0.25}, default_rate=0.0).select("doc_id").collect()}
    b = {r["doc_id"] for r in sample_by_rates(docs, "source", {"src0": 0.25}, default_rate=0.0).select("doc_id").collect()}
    assert a == b  # reproducible
    half = {r["doc_id"] for r in sample_by_rates(docs, "source", {"src0": 0.5}, default_rate=0.0).select("doc_id").collect()}
    assert a <= half  # thresholds nest


def test_sample_by_rates_proportions(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import sample_by_rates

    docs = tables["documents"]
    n_src0 = docs.filter("source = 'src0'").count()
    kept = sample_by_rates(docs, "source", {"src0": 0.5}, default_rate=1.0)
    k_src0 = kept.filter("source = 'src0'").count()
    # md5 buckets are uniform; 50% ± generous tolerance at small n
    assert abs(k_src0 / n_src0 - 0.5) < 0.25
    # other sources untouched at default_rate=1.0
    assert kept.filter("source <> 'src0'").count() == docs.filter("source <> 'src0'").count()


def test_sample_by_rates_default_drop_and_validation(spark, tables):
    import pytest as _pytest

    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import sample_by_rates

    docs = tables["documents"]
    kept = sample_by_rates(docs, "source", {"src0": 1.0})  # default 0.0
    assert kept.filter("source <> 'src0'").count() == 0
    assert kept.filter("source = 'src0'").count() == docs.filter("source = 'src0'").count()
    with _pytest.raises(ValueError):
        sample_by_rates(docs, "source", {"src0": 1.5})


def test_sample_by_rates_no_shuffle(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import sample_by_rates

    df = sample_by_rates(tables["documents"], "source", {"src0": 0.5}, default_rate=0.2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_key_deterministic_uniform_and_total(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import shuffle_key
    import hashlib

    docs = tables["documents"].select("doc_id")
    k1 = [r.k for r in docs.select(shuffle_key("doc_id", seed=1).alias("k")).collect()]
    k2 = [r.k for r in docs.select(shuffle_key("doc_id", seed=1).alias("k")).collect()]
    assert k1 == k2  # deterministic
    assert len(set(k1)) == len(k1)  # total order: no ties
    # portable: reproducible with plain python md5
    ids = [r.doc_id for r in docs.collect()]
    exp = [hashlib.md5(f"1:{i}".encode()).hexdigest() + f":{i}" for i in ids]
    assert k1 == exp
    # different seeds give a genuinely different permutation
    k3 = [r.k for r in docs.select(shuffle_key("doc_id", seed=2).alias("k")).collect()]
    assert sorted(zip(k1, ids)) != sorted(zip(k3, ids))
    order1 = [i for _, i in sorted(zip(k1, ids))]
    order3 = [i for _, i in sorted(zip(k3, ids))]
    assert order1 != order3 and order1 != sorted(ids)


def test_leakage_safe_split_keeps_neardup_clusters_together(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        assign_split,
        assign_split_leakage_safe,
    )

    docs = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    # chains: (0,1),(1,2) one component; (10,11); rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 51)], ["id_a", "id_b"]
    )
    out = assign_split_leakage_safe(docs, pairs, splits={"train": 0.5, "test": 0.5})
    lab = {r.doc_id: r.split for r in out.collect()}
    assert lab[0] == lab[1] == lab[2]
    assert lab[10] == lab[11]
    assert lab[50] == lab[51]
    # members adopt the REPRESENTATIVE's hash = plain assign_split of min id
    base = {
        r.doc_id: r.split
        for r in assign_split(docs, splits={"train": 0.5, "test": 0.5}).collect()
    }
    assert lab[2] == base[0] and lab[11] == base[10]
    # singletons keep their own assignment
    for i in (5, 99, 150):
        assert lab[i] == base[i]
    # columns preserved + split column added
    assert out.columns == ["doc_id", "split"]


def test_leakage_safe_split_real_neardups(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators import dedup as DD
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        assign_split_leakage_safe,
    )

    docs = tables["documents"]
    pairs = DD.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5, df_cut=20)
    out = assign_split_leakage_safe(docs, pairs)
    lab = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    for r in pairs.collect():
        assert lab[r.id_a] == lab[r.id_b], (r.id_a, r.id_b)


def test_mixture_planning_end_to_end(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        plan_mixture_rates,
        sample_by_rates,
        source_token_stats,
    )

    docs = tables["documents"]
    avail = source_token_stats(docs)
    assert set(avail) and all(v > 0 for v in avail.values())
    total = sum(avail.values())
    targets = {s: 1.0 for s in avail}  # equal shares
    plan = plan_mixture_rates(avail, targets, token_budget=total // 2)
    assert all(0.0 <= r <= 1.0 for r in plan["rates"].values())
    # the plan's expected tokens land near the budget (caps may undershoot)
    assert 0 < sum(plan["expected_tokens"].values()) <= total // 2 + len(avail)
    sampled = sample_by_rates(docs, "source", plan["rates"])
    got = source_token_stats(sampled)
    # the sampling is a pure function of (id, seed): reproduce the kept
    # token totals exactly in python and compare (no statistical band —
    # at 500 docs per-source variance would swamp any loose assertion)
    import hashlib

    exp_toks = {}
    for r in docs.select("doc_id", "source", "text").collect():
        bucket = int(hashlib.md5(f"mix:42:{r.doc_id}".encode()).hexdigest()[:8], 16)
        if bucket < int(plan["rates"][r.source] * (1 << 32)):
            exp_toks[r.source] = exp_toks.get(r.source, 0) + len(r.text.strip().split())
    for s in avail:
        assert got.get(s, 0) == exp_toks.get(s, 0), s


def test_mixture_planning_shortfall_and_validation(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        plan_mixture_rates,
    )

    plan = plan_mixture_rates({"a": 100, "b": 10_000}, {"a": 0.5, "b": 0.5}, 2_000)
    assert plan["rates"]["a"] == 1.0 and plan["shortfall"]["a"] == 900
    assert plan["rates"]["b"] == pytest.approx(0.1)
    assert plan["shortfall"]["b"] == 0
    missing = plan_mixture_rates({"b": 10}, {"a": 1.0}, 100)
    assert missing["rates"]["a"] == 0.0 and missing["shortfall"]["a"] == 100
    with pytest.raises(ValueError):
        plan_mixture_rates({"a": 1}, {"a": 1.0}, 0)
