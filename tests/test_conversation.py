"""W1-W3: the running-token-sum TakeWhile window (ChatService.cs:248-271),
boundary semantics included, plus a hypothesis property test against a
literal Python port of the reference's loop."""

from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.conversation import (
    conversation_text,
    conversation_window,
)

T0 = datetime(2024, 1, 1)


def _messages(spark, tokens_newest_first, session="s1"):
    """Build messages so index 0 is the NEWEST (matching how the reference
    iterates)."""
    n = len(tokens_newest_first)
    rows = [
        (session, T0 + timedelta(minutes=n - i), int(tok), f"m{i}")
        for i, tok in enumerate(tokens_newest_first)
    ]
    return spark.createDataFrame(rows, "session_id string, ts timestamp, tokens int, text string")


def _reference_takewhile(tokens_newest_first, cap):
    """Literal port of ChatService.cs:260: increment BEFORE compare, stop at
    the FIRST violation."""
    kept, running = [], 0
    for i, tok in enumerate(tokens_newest_first):
        running += tok
        if running > cap:
            break
        kept.append(f"m{i}")
    return set(kept)


def test_boundary_message_that_exactly_hits_cap_is_kept(spark):
    # running sums: 100, 400, 500(== cap -> kept), then stop
    df = _messages(spark, [100, 300, 100, 50])
    out = conversation_window(df, max_tokens=500)
    assert {r.text for r in out.collect()} == {"m0", "m1", "m2"}


def test_stops_at_first_violation_no_reentry(spark):
    # 200, 700(>cap, stop) — the tiny m2 afterwards must NOT re-enter
    df = _messages(spark, [200, 500, 10])
    out = conversation_window(df, max_tokens=500)
    assert {r.text for r in out.collect()} == {"m0"}


def test_output_is_chronological(spark):
    df = _messages(spark, [10, 10, 10])
    out = conversation_window(df, max_tokens=500).collect()
    assert [r.text for r in out] == ["m2", "m1", "m0"]  # oldest -> newest (W3)
    assert [r.ts for r in out] == sorted(r.ts for r in out)


def test_multiple_sessions_trimmed_independently(spark):
    a = _messages(spark, [400, 400], session="a")
    b = _messages(spark, [100, 100], session="b")
    out = conversation_window(a.unionByName(b), max_tokens=500)
    got = {(r.session_id, r.text) for r in out.collect()}
    assert got == {("a", "m0"), ("b", "m0"), ("b", "m1")}


def test_conversation_text_newline_join(spark):
    df = _messages(spark, [10, 10])
    row = conversation_text(df, max_tokens=500).first()
    assert row.conversation == "m1\nm0"  # chronological, "\n"-joined (ChatService.cs:267)


@settings(max_examples=25, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=8),
    cap=st.integers(min_value=0, max_value=600),
)
def test_matches_reference_loop_property(spark, tokens, cap):
    df = _messages(spark, tokens)
    got = {r.text for r in conversation_window(df, max_tokens=cap).collect()}
    assert got == _reference_takewhile(tokens, cap)
