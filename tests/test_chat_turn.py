"""SURVEY §3.1 E2E: the composed chat turn (embed -> search -> window ->
trim -> complete -> persist) plus first-exchange summarize-rename, on
deterministic fakes (ChatService.cs:119-165, :273-282)."""

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
    RemoteCompleter,
    RemoteSummarizer,
    fake_completion_transport,
    fake_summarize_transport,
)
from vector_search_ai_assistant_mongodbvcore_spark.functions.embedder import HashNgramEmbedder
from vector_search_ai_assistant_mongodbvcore_spark.operators.chat import (
    chat_turn,
    summarize_session_name,
)
from vector_search_ai_assistant_mongodbvcore_spark.operators.sessions import SessionStore
from vector_search_ai_assistant_mongodbvcore_spark.sources.ingest import ingest_and_vectorize

PRODUCTS = [
    ("p1", "Touring Bike", "A comfortable touring bike for long rides"),
    ("p2", "Mountain Bike", "A rugged mountain bike with suspension"),
    ("p3", "Racing Socks", "Lightweight racing socks"),
    ("p4", "Helmet", "A sturdy helmet for safety"),
]


@pytest.fixture()
def world(spark, tmp_path):
    emb = HashNgramEmbedder(dims=64)
    corpus = ingest_and_vectorize(
        spark.createDataFrame(PRODUCTS, "id string, name string, description string"),
        embedder=emb,
    )
    store = SessionStore(spark, str(tmp_path))
    completer = RemoteCompleter(transport=fake_completion_transport)
    summarizer = RemoteSummarizer(transport=fake_summarize_transport)
    return emb, corpus, store, completer, summarizer


def test_full_turn_persists_exchange_and_rollup(spark, world):
    emb, corpus, store, completer, _ = world
    sid = store.create_session()
    completion = chat_turn(
        spark, store, corpus, sid, "What kind of bikes do you have?",
        emb, completer, k=2, vector_col="vector", id_cols=("id",),
    )
    assert completion.startswith("Based on ")
    msgs = store.get_messages(sid).collect()
    assert [m.sender for m in msgs] == ["User", "Assistant"]
    assert msgs[0].text == "What kind of bikes do you have?"
    assert msgs[1].text == completion
    # A3 rollup: prompt.Tokens + completion.PromptTokens + completion.Tokens
    sess = store.list_sessions().first()
    assert sess.tokens_used == msgs[0].tokens + msgs[1].prompt_tokens + msgs[1].tokens
    assert msgs[0].tokens > 0 and msgs[1].tokens > 0


def test_second_turn_sees_conversation_history(spark, world):
    emb, corpus, store, completer, _ = world
    seen = []

    def spy(system, user, params):
        seen.append(user)
        return fake_completion_transport(system, user, params)

    completer = RemoteCompleter(transport=spy)
    sid = store.create_session()
    chat_turn(spark, store, corpus, sid, "first question?", emb, completer,
              k=2, vector_col="vector", id_cols=("id",))
    chat_turn(spark, store, corpus, sid, "second question?", emb, completer,
              k=2, vector_col="vector", id_cols=("id",))
    # turn 2's user payload = trimmed conversation + "\n" + prompt
    assert "first question?" in seen[1]
    assert seen[1].endswith("\nsecond question?")


def test_first_exchange_summarize_rename(spark, world):
    emb, corpus, store, completer, summarizer = world
    sid = store.create_session()
    chat_turn(spark, store, corpus, sid, "Bikes available today?", emb, completer,
              k=2, vector_col="vector", id_cols=("id",))
    assert {r.session_id for r in store.first_exchange_sessions().collect()} == {sid}
    texts = [r.text for r in store.get_messages(sid).select("text").collect()]
    name = summarize_session_name(store, summarizer, sid, "\n".join(texts))
    assert name == "Bikes available"  # fake: first two words, F1-cleaned
    assert store.list_sessions().first().name == "Bikes available"


def test_turn_payload_is_reranked(spark, world):
    """Verdict #7: the lifecycle serves retrieve -> rerank -> payload. With
    the lexical scorer, the query's own words dominate the rerank, so the
    doc sharing the most query vocabulary must lead the payload even when
    cosine recall ranked it lower."""
    emb, corpus, store, completer, _ = world
    captured = []

    def spy(system, user, params):
        captured.append(system)
        return fake_completion_transport(system, user, params)

    completer = RemoteCompleter(transport=spy)
    sid = store.create_session()
    q = "rugged mountain bike with suspension"
    chat_turn(spark, store, corpus, sid, q, emb, completer,
              k=4, vector_col="vector", id_cols=("id",))
    from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
        SYSTEM_PROMPT_RETAIL_ASSISTANT,
    )

    payload = captured[0].removeprefix(SYSTEM_PROMPT_RETAIL_ASSISTANT)
    # p2's description IS the query minus one word -> max lexical overlap
    first_doc = payload.split("} {")[0]
    assert "Mountain Bike" in first_doc
    # rerank order must differ from raw reference order only in ordering,
    # never in membership: all 4 docs still present
    for name in ("Touring Bike", "Mountain Bike", "Racing Socks", "Helmet"):
        assert name in payload


def test_rerank_disabled_matches_reference_shape(spark, world):
    """rerank_candidates=None serves the raw top-k payload (score order)."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
        vector_search_payload,
    )

    emb, corpus, store, completer, _ = world
    captured = []

    def spy(system, user, params):
        captured.append(system)
        return fake_completion_transport(system, user, params)

    completer = RemoteCompleter(transport=spy)
    sid = store.create_session()
    q = "What kind of bikes do you have?"
    chat_turn(spark, store, corpus, sid, q, emb, completer,
              k=3, vector_col="vector", id_cols=("id",), rerank_candidates=None)
    qv = [float(x) for x in emb.embed_numpy([q])[0]]
    expected = vector_search_payload(
        corpus, qv, k=3, vector_col="vector", id_cols=("id",)
    ).collect()[0]["payload"]
    from vector_search_ai_assistant_mongodbvcore_spark.functions.completion import (
        SYSTEM_PROMPT_RETAIL_ASSISTANT,
    )

    assert captured[0] == SYSTEM_PROMPT_RETAIL_ASSISTANT + expected


def test_full_turn_on_object_store_universe(spark, tmp_path, monkeypatch):
    """The whole imperative lifecycle (§3.1: embed -> search -> window ->
    trim -> complete -> persist -> rollup) in the ALL-OBJECT-STORE
    universe (r13): the SessionStore's ManagedTables commit via
    conditional-put + per-object copy publish — no POSIX rename or lock
    anywhere in the reference's hot path."""
    from vector_search_ai_assistant_mongodbvcore_spark.sources import managed_table as MT
    from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
        EmulatedObjectDataPlane,
    )

    monkeypatch.setattr(
        MT,
        "_DEFAULT_COMMITTER",
        MT.ConditionalPutCommitter(
            MT.MemoryConditionalStore(), EmulatedObjectDataPlane()
        ),
    )
    emb = HashNgramEmbedder(dims=64)
    corpus = ingest_and_vectorize(
        spark.createDataFrame(PRODUCTS, "id string, name string, description string"),
        embedder=emb,
    )
    store = SessionStore(spark, str(tmp_path / "sess"))
    completer = RemoteCompleter(transport=fake_completion_transport)
    summarizer = RemoteSummarizer(transport=fake_summarize_transport)
    sid = store.create_session()
    chat_turn(
        spark, store, corpus, sid, "do you have socks?",
        emb, completer, k=2, vector_col="vector", id_cols=("id", "name"),
    )
    msgs = store.get_messages(sid).orderBy("ts").collect()
    assert [m["sender"] for m in msgs] == ["User", "Assistant"]
    assert store.first_exchange_sessions().count() == 1
    summarize_session_name(store, summarizer, sid, msgs[0]["text"])
    assert store.list_sessions().first().name not in ("", "New Chat")
    # second turn sees history, rollup accumulates
    chat_turn(
        spark, store, corpus, sid, "and bikes?",
        emb, completer, k=2, vector_col="vector", id_cols=("id", "name"),
    )
    assert store.get_messages(sid).count() == 4
    assert store.list_sessions().first().tokens_used > 0
