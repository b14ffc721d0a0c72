"""F5/F6: BuildPrompts proportional trim vs a hand-computed port of the C#
arithmetic (ChatService.cs:172-243) — denominator includes prompt + buffer,
banker's rounding, head-slice RAG, tail-slice conversation, and the
"\n"+prompt suffix in both branches."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
    _encode_py,
    _split_py,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.prompt_budget import (
    TOKEN_ESTIMATE_BUFFER,
    build_prompts,
)

RAG = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
CONV = "one two three four five six seven eight nine ten " * 3
PROMPT = "what products are available today?"


def _expected(rag, conv, prompt, max_tokens):
    """Literal port of ChatService.cs:196-237 (round() in Python 3 IS
    banker's rounding, same as C# Math.Round default)."""
    rag_t, conv_t, prompt_t = (len(_encode_py(x)) for x in (rag, conv, prompt))
    total = rag_t + conv_t + prompt_t + TOKEN_ESTIMATE_BUFFER
    if total > max_tokens:
        reduce = total - max_tokens
        new_rag = round(rag_t - (rag_t / total) * reduce)
        new_conv = round(conv_t - (conv_t / total) * reduce)
        t_rag = "".join(_split_py(rag)[:new_rag])
        t_conv = "".join(_split_py(conv)[-new_conv:]) if new_conv > 0 else ""
        return new_rag, new_conv, t_rag, t_conv + "\n" + prompt
    return rag_t, conv_t, rag, conv + "\n" + prompt


def _run(spark, rag, conv, prompt, max_tokens):
    df = spark.createDataFrame(
        [(rag, conv, prompt)], "rag_payload string, conversation string, prompt string"
    )
    return build_prompts(df, max_tokens=max_tokens).first()


def test_over_budget_trim_matches_csharp_arithmetic(spark):
    row = _run(spark, RAG, CONV, PROMPT, max_tokens=120)
    e_rag_t, e_conv_t, e_rag, e_conv_prompt = _expected(RAG, CONV, PROMPT, 120)
    assert row.rag_tokens_out == e_rag_t
    assert row.conv_tokens_out == e_conv_t
    assert row.trimmed_rag == e_rag
    assert row.conversation_and_prompt == e_conv_prompt


def test_under_budget_passthrough(spark):
    row = _run(spark, "short rag", "short conv", PROMPT, max_tokens=4000)
    assert row.trimmed_rag == "short rag"
    assert row.trimmed_conversation == "short conv"
    # ChatService.cs:237: conversation + "\n" + prompt even when untrimmed
    assert row.conversation_and_prompt == "short conv\n" + PROMPT


def test_under_trim_is_preserved_not_fixed(spark):
    """The reference's percentages divide by the FULL estimate (prompt +
    buffer included), so rag%+conv% < 1 and the result may still exceed the
    budget — a quirk we must preserve, not repair."""
    row = _run(spark, RAG, CONV, PROMPT, max_tokens=120)
    prompt_t = len(_encode_py(PROMPT))
    out_total = row.rag_tokens_out + row.conv_tokens_out + prompt_t + TOKEN_ESTIMATE_BUFFER
    assert out_total > 120  # deliberately still over: the reference under-trims


def test_rag_head_conversation_tail(spark):
    row = _run(spark, RAG, CONV, PROMPT, max_tokens=120)
    assert 0 < len(row.trimmed_rag) < len(RAG)
    assert RAG.startswith(row.trimmed_rag)  # RAG keeps its HEAD (:214-216)
    assert CONV.endswith(row.trimmed_conversation)  # conversation keeps its TAIL (:219-224)


def test_empty_inputs_do_not_crash(spark):
    row = _run(spark, "", "", "", max_tokens=100)
    assert row.rag_tokens_out == 0 and row.conv_tokens_out == 0
    assert row.conversation_and_prompt == "\n"
