"""SessionStore: CRUD (P3/P5, S3-S6), the chat-turn transaction + token
rollup (S7/A3), the first-exchange trigger (A4), and the polymorphic
completions view (SURVEY §1.1)."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.sessions import SessionStore


@pytest.fixture()
def store(spark, tmp_path):
    return SessionStore(spark, str(tmp_path))


def test_create_list_rename_delete(spark, store):
    sid = store.create_session()
    assert store.list_sessions().count() == 1
    row = store.list_sessions().first()
    assert row.name == "New Chat" and row.type == "Session" and row.tokens_used == 0

    store.rename_session(sid, "Bikes")
    assert store.list_sessions().first().name == "Bikes"

    store.delete_session(sid)
    assert store.list_sessions().count() == 0


def test_add_turn_rollup_matches_reference_arithmetic(spark, store):
    """ChatService.cs:313-316: TokensUsed += prompt.Tokens +
    completion.PromptTokens + completion.Tokens."""
    sid = store.create_session()
    store.add_turn(sid, "q1", 11, "a1", 7, 30)
    store.add_turn(sid, "q2", 5, "a2", 3, 20)
    sess = store.list_sessions().filter(F.col("session_id") == sid).first()
    assert sess.tokens_used == (11 + 30 + 7) + (5 + 20 + 3)

    msgs = store.get_messages(sid).collect()
    assert [m.sender for m in msgs] == ["User", "Assistant", "User", "Assistant"]
    # prompt message timestamp strictly precedes its completion's (ChatService.cs:129-130)
    assert msgs[0].ts < msgs[1].ts
    assert msgs[1].prompt_tokens == 30 and msgs[1].tokens == 7


def test_first_exchange_trigger(spark, store):
    """A4: rename fires exactly when a session has 2 messages
    (ChatPane.razor:255-264)."""
    s1 = store.create_session()
    s2 = store.create_session()
    store.add_turn(s1, "q", 1, "a", 1, 1)  # 2 messages -> eligible
    store.add_turn(s2, "q", 1, "a", 1, 1)
    store.add_turn(s2, "q2", 1, "a2", 1, 1)  # 4 messages -> not eligible
    eligible = {r.session_id for r in store.first_exchange_sessions().collect()}
    assert eligible == {s1}


def test_delete_session_removes_messages_too(spark, store):
    """S6: DeleteManyAsync on SessionId hits both entity types
    (MongoDbService.cs:598-613)."""
    sid = store.create_session()
    keep = store.create_session()
    store.add_turn(sid, "q", 1, "a", 1, 1)
    store.add_turn(keep, "q", 1, "a", 1, 1)
    store.delete_session(sid)
    assert store.get_messages(sid).count() == 0
    assert store.get_messages(keep).count() == 2


def test_completions_view_is_polymorphic(spark, store):
    """The reference's single-collection Type-discriminated layout is still
    constructible (MongoDbService.cs:452-453, :478-480 filter shapes)."""
    sid = store.create_session()
    store.add_turn(sid, "q", 1, "a", 1, 1)
    view = store.completions_view()
    by_type = {r["type"]: r["n"] for r in view.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"Session": 1, "Message": 2}
    # P4: the reference's message-load filter works against the view
    msgs = view.filter((F.col("type") == "Message") & (F.col("session_id") == sid))
    assert msgs.count() == 2
