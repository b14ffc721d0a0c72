"""Hypothesis properties for the round-14 profiling tier: the KMV
sketch against a pure-Python md5 oracle (any values, any duplication,
any partitioning) and the contract checker's metrics against
pandas-computed truths."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import (
    check,
    completeness,
    compliance,
    mean_between,
    row_count,
    uniqueness,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.sketches import (
    kmv_smallest,
)

# values with deliberate duplication pressure and unicode
values_strategy = st.lists(
    st.one_of(
        st.integers(min_value=-50, max_value=50).map(str),
        st.sampled_from(["", "a", "dup", "naïve", "kmv:tricky", "x y z"]),
    ),
    min_size=0,
    max_size=120,
)


def _py_kmv(vals: "list[str]", k: int) -> "list[int]":
    hs = {
        int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:15], 16) for v in vals
    }
    return sorted(hs)[:k]


@settings(max_examples=10, deadline=None)
@given(vals=values_strategy, k=st.sampled_from([2, 5, 16]), parts=st.sampled_from([1, 3, 8]))
def test_kmv_smallest_matches_python_oracle(spark, vals, k, parts):
    """kmv_smallest == the pure-Python k smallest distinct md5 hashes,
    for any values, duplication, k, and partitioning."""
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(parts)
    got = [r["h"] for r in kmv_smallest(df, "v", k=k).collect()]
    assert got == _py_kmv(vals, k)


num_strategy = st.lists(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    min_size=0,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(vals=num_strategy)
def test_contract_metrics_match_python_truth(spark, vals):
    """completeness / uniqueness / compliance / row_count / mean metrics
    equal their directly-computed definitions on arbitrary nullable
    integer data."""
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    rows = {
        r["constraint"]: r["metric"]
        for r in check(
            df,
            [
                completeness("v", 0.5),
                uniqueness("v", 0.5),
                compliance("v > 0", 0.5),
                row_count(0, None),
                mean_between("v", -1000.0, 1000.0),
            ],
        ).collect()
    }
    n = len(vals)
    nn = sum(1 for v in vals if v is not None)
    d = len({v for v in vals if v is not None})
    pos = sum(1 for v in vals if v is not None and v > 0)
    assert rows["row_count >= 0"] == float(n)
    assert rows["completeness(v) >= 0.5"] == (nn / n if n else 1.0)
    assert rows["uniqueness(v) >= 0.5"] == (d / nn if nn else 1.0)
    assert rows["compliance(v > 0) >= 0.5"] == (pos / n if n else 1.0)
    want_mean = (sum(v for v in vals if v is not None) / nn) if nn else None
    got_mean = rows["mean(v) in [-1000.0, 1000.0]"]
    if want_mean is None:
        assert got_mean is None
    else:
        assert math.isclose(got_mean, want_mean, rel_tol=0, abs_tol=1e-9)
