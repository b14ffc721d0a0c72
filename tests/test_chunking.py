"""Document chunking operator (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.chunking import chunk_documents


def _chunks(spark, text, size, overlap):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = chunk_documents(df, size=size, overlap=overlap).collect()
    return sorted(rows, key=lambda r: r["chunk_id"])


def test_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(10)]
    rows = _chunks(spark, " ".join(words), size=4, overlap=2)
    # stride 2 -> starts 0,2,4,6,8
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert rows[4]["chunk_text"] == "w8 w9"  # truncated tail, never empty
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 2]
    # every word covered
    covered = set(" ".join(r["chunk_text"] for r in rows).split())
    assert covered == set(words)


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c", size=32, overlap=8)
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c" and rows[0]["n_tokens"] == 3


def test_empty_and_whitespace_docs_produce_no_chunks(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one")], "doc_id long, text string"
    )
    rows = chunk_documents(df, size=4, overlap=1).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_zero_overlap_partitions_exactly(spark):
    rows = _chunks(spark, " ".join(str(i) for i in range(9)), size=3, overlap=0)
    texts = [r["chunk_text"] for r in rows]
    assert texts == ["0 1 2", "3 4 5", "6 7 8"]


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=-1)


def test_no_shuffle_plan(spark, tables):
    df = chunk_documents(tables["documents"], size=32, overlap=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan -> generate -> project only
    assert "Generate" in plan


def test_row_count_bound(spark, tables):
    # chunks per doc = ceil(n_words / stride); with overlap<size the output
    # token total is bounded by tokens * size/stride
    docs = tables["documents"]
    n_chunks = chunk_documents(docs, size=32, overlap=8).count()
    n_docs = docs.filter(F.trim("text") != "").count()
    assert n_chunks >= n_docs  # at least one chunk per nonempty doc


# ---- property tests --------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    @settings(max_examples=15, deadline=None)
    @given(
        words=st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=40),
        size=st.integers(2, 10),
        overlap=st.integers(0, 8),
    )
    def test_chunking_invariants(spark, words, size, overlap):
        if overlap >= size:
            overlap = size - 1
        text = " ".join(words)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, size=size, overlap=overlap).collect(),
            key=lambda r: r["chunk_id"],
        )
        stride = size - overlap
        # chunk count = ceil(n / stride)
        assert len(rows) == -(-len(words) // stride)
        # ids contiguous from 0
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        # every chunk nonempty, at most `size` tokens, n_tokens consistent
        for r in rows:
            toks = r["chunk_text"].split(" ")
            assert 1 <= len(toks) <= size
            assert len(toks) == r["n_tokens"]
        # exact coverage: token i of the doc appears at its expected
        # offset inside chunk i//stride
        for i, w in enumerate(words):
            c = rows[i // stride]
            assert c["chunk_text"].split(" ")[i - (i // stride) * stride] == w


# ---------------------------------------------------------------------------
# unit="token": the engine-tokenizer currency (verdict #8)
# ---------------------------------------------------------------------------


def _token_chunks(spark, text, size, overlap):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = chunk_documents(df, size=size, overlap=overlap, unit="token").collect()
    return sorted(rows, key=lambda r: r["chunk_id"])


def test_token_unit_matches_engine_tokenizer(spark):
    """The JVM regexp splitter produces EXACTLY the tokenizer's fallback
    split (functions/tokenizer.py _split_py), so chunk n_tokens is the same
    currency the prompt-budget operators count."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import _split_py

    text = "Hello, world!  Order #42 ships in 3-5 days (maybe)."
    toks = _split_py(text)
    rows = _token_chunks(spark, text, size=len(toks) + 1, overlap=0)
    assert len(rows) == 1
    assert rows[0]["n_tokens"] == len(toks)
    assert rows[0]["chunk_text"] == "".join(toks) == text


def test_token_unit_round_trip_reconstructs_document(spark):
    """Round-trip contract: chunk 0 plus each later chunk minus its
    `overlap` leading tokens reconstructs the document byte-for-byte."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import _split_py

    text = (
        "Spark chunks documents, with punctuation: 12 tokens/window... "
        "then   rebuilds them -- exactly; even with   weird   spacing!"
    )
    size, overlap = 7, 3
    rows = _token_chunks(spark, text, size=size, overlap=overlap)
    assert len(rows) > 2
    rebuilt = rows[0]["chunk_text"]
    for r in rows[1:]:
        toks = _split_py(r["chunk_text"])
        rebuilt += "".join(toks[overlap:])
    assert rebuilt == text


def test_token_unit_overlap_tokens_shared(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import _split_py

    text = " ".join(f"tok{i}" for i in range(20))
    rows = _token_chunks(spark, text, size=6, overlap=2)
    for a, b in zip(rows, rows[1:]):
        ta, tb = _split_py(a["chunk_text"]), _split_py(b["chunk_text"])
        assert ta[-2:] == tb[:2]


def test_token_unit_no_shuffle_plan(spark, tables):
    df = chunk_documents(tables["documents"], size=32, overlap=8, unit="token")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_invalid_unit_raises(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=1, unit="sentence")
