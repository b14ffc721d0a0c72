"""S9/S10: completion + summarize sources — reference params, retry policy,
F1 output clean, and both calling forms (driver-side + Arrow-batched UDF)."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
    SUMMARIZE_PROMPT,
    SYSTEM_PROMPT_RETAIL_ASSISTANT,
    RemoteCompleter,
    RemoteSummarizer,
    clean_summary,
    fake_completion_transport,
    fake_summarize_transport,
)


def test_completer_params_match_reference():
    """OpenAiService.cs:181-186: temp 0.3, top-p 0.95, penalties 0."""
    p = RemoteCompleter(max_completion_tokens=2000).params()
    assert p == {
        "max_tokens": 2000,
        "temperature": 0.3,
        "top_p": 0.95,
        "frequency_penalty": 0,
        "presence_penalty": 0,
    }


def test_summarizer_params_match_reference():
    """OpenAiService.cs:229-235: temp 0.0, top-p 1.0, max 200."""
    p = RemoteSummarizer().params()
    assert p == {
        "max_tokens": 200,
        "temperature": 0.0,
        "top_p": 1.0,
        "frequency_penalty": 0,
        "presence_penalty": 0,
    }


def test_complete_prepends_retail_system_prompt():
    seen = {}

    def spy(system, user, params):
        seen.update(system=system, user=user)
        return "ok", 1, 1

    out, pt, ct = RemoteCompleter(transport=spy).complete("what bikes?", "{'doc': 1}")
    assert seen["system"] == SYSTEM_PROMPT_RETAIL_ASSISTANT + "{'doc': 1}"  # :169
    assert seen["user"] == "what bikes?"
    assert out == "ok" and (pt, ct) == (1, 1)


def test_summarize_applies_f1_clean():
    """OpenAiService.cs:244: non-alphanumerics stripped from model output."""
    def noisy(system, user, params):
        assert system == SUMMARIZE_PROMPT
        return "Bike *Sales*!!", 1, 1

    assert RemoteSummarizer(transport=noisy).summarize("whatever") == "Bike Sales"
    assert clean_summary("a-b_c 1!2?") == "abc 12"


def test_no_transport_raises():
    with pytest.raises(NotImplementedError):
        RemoteCompleter().complete("q", "docs")


def test_retry_policy():
    calls = {"n": 0}

    def flaky(system, user, params):
        calls["n"] += 1
        if calls["n"] < 4:
            raise TimeoutError("transient")
        return "recovered", 2, 3

    c = RemoteCompleter(transport=flaky, base_delay_s=0.0)
    assert c.complete("q", "d") == ("recovered", 2, 3)
    assert calls["n"] == 4

    def down(system, user, params):
        raise TimeoutError("down")

    with pytest.raises(TimeoutError):
        RemoteCompleter(transport=down, base_delay_s=0.0, max_retries=2).complete("q", "d")


def test_fakes_are_deterministic():
    a = fake_completion_transport("sys", "what bikes are in stock today please", {})
    b = fake_completion_transport("sys", "what bikes are in stock today please", {})
    assert a == b
    assert fake_summarize_transport("s", "Mountain Bikes Rule", {})[0] == "Mountain Bikes"


def test_batch_udfs_in_plan(spark):
    df = spark.createDataFrame(
        [("what bikes?", "doc one"), ("any socks?", "doc two")], "prompt string, docs string"
    )
    completer = RemoteCompleter(transport=fake_completion_transport)
    summ = RemoteSummarizer(transport=fake_summarize_transport)
    rows = df.select(
        completer.udf()(F.col("prompt"), F.col("docs")).alias("c"),
        summ.udf()(F.col("prompt")).alias("label"),
    ).collect()
    for r in rows:
        assert r.c.text.startswith("Based on ")
        assert r.c.prompt_tokens > 0 and r.c.completion_tokens > 0
    assert rows[0].label == "what bikes"  # F1-cleaned two-word label
