"""F6/A5: tokenizer kit — encode/count agreement, decode round-trip,
head/tail slice partition property, and the SQL-exact estimator."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
    _encode_py,
    _split_py,
    approx_token_count,
    count_tokens,
    detokenize_head,
    detokenize_tail,
    tokenize,
)

SAMPLES = [
    "hello world",
    "  leading and trailing  ",
    "punct! marks? (grouped)... 123 mixed42tokens",
    "",
    "one",
    "tabs\tand\nnewlines mixed   spaces",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_split_round_trips_exactly(text):
    """The fallback tokenizer must lose NOTHING: joining the split tokens
    reproduces the input byte-for-byte (decode(encode(x)) == x)."""
    assert "".join(_split_py(text)) == text


@pytest.mark.parametrize("text", SAMPLES)
def test_count_equals_len_encode(text):
    assert len(_encode_py(text)) == len(_split_py(text))


def test_spark_udfs_agree_with_python(spark):
    df = spark.createDataFrame([(t,) for t in SAMPLES], "text string")
    rows = df.select(
        "text", count_tokens("text").alias("n"), F.size(tokenize("text")).alias("m")
    ).collect()
    for r in rows:
        assert r.n == r.m == len(_encode_py(r.text))


def test_head_tail_partition_property(spark):
    """decode(enc[:k]) + decode(enc[-(n-k):]) == original text — the slices
    used by the trim operator partition the token stream."""
    text = "the quick brown fox, jumps over 2 lazy dogs!"
    n = len(_encode_py(text))
    df = spark.createDataFrame([(text, k) for k in range(n + 1)], "text string, k int")
    rows = df.select(
        "k",
        detokenize_head(F.col("text"), F.col("k")).alias("head"),
        detokenize_tail(F.col("text"), F.lit(n) - F.col("k")).alias("tail"),
    ).collect()
    for r in rows:
        assert r.head + r.tail == text


def test_approx_token_count_sql_semantics(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("   ",), ("single",)], "text string")
    got = [r.n for r in df.select(approx_token_count("text").alias("n")).collect()]
    assert got == [3, 0, 0, 1]
