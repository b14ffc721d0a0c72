"""Salted join: result equivalence with the plain join + salt distribution."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key carrying 90% of rows
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    left = spark.createDataFrame(rows, "k string, v int")
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"V{i}") for i in range(100)], "k string, label string"
    )
    return left, right


def test_salted_join_equals_plain_join(spark, skewed):
    left, right = skewed
    plain = {(r.k, r.v, r.label) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.label) for r in salted_join(left, right, ["k"], num_salts=4).collect()}
    assert salted == plain and len(plain) == 1000


def test_hot_key_spreads_across_salts(spark, skewed):
    left, _ = skewed
    l = left.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(4)))
    dist = {
        r["_salt"]: r["n"]
        for r in l.filter(F.col("k") == "hot").groupBy("_salt").agg(F.count("*").alias("n")).collect()
    }
    assert len(dist) == 4  # the hot key now occupies 4 shuffle sub-keys
    assert max(dist.values()) < 900  # no single reducer gets all of it


def test_left_join_preserves_unmatched(spark, skewed):
    left, right = skewed
    right_missing = right.filter(F.col("k") != "hot")
    out = salted_join(left, right_missing, ["k"], num_salts=4, how="left")
    hot_rows = out.filter(F.col("k") == "hot").collect()
    assert len(hot_rows) == 900 and all(r.label is None for r in hot_rows)
