"""ManagedTable (S3-S7): versioned CRUD, keyed merge, deletes, the
cross-table transaction protocol, and vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
    ManagedTable,
    TransactionalWriter,
)


@pytest.fixture()
def table(spark, tmp_path):
    return ManagedTable(spark, str(tmp_path / "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, cat string, v int")


def test_append_and_read(spark, table):
    assert not table.exists()
    table.append(_df(spark, [("a", "x", 1), ("b", "x", 2)]))
    assert table.exists()
    table.append(_df(spark, [("c", "y", 3)]))
    assert sorted(r.k for r in table.read().collect()) == ["a", "b", "c"]


def test_merge_upserts_by_compound_key(spark, table):
    """S4: the reference upserts on (categoryId, _id) (MongoDbService.cs:254-258)."""
    table.append(_df(spark, [("a", "x", 1), ("b", "x", 2)]))
    table.merge(_df(spark, [("a", "x", 99), ("d", "z", 4)]), keys=["k", "cat"])
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {"a": 99, "b": 2, "d": 4}


def test_point_and_predicate_delete(spark, table):
    table.append(_df(spark, [("a", "x", 1), ("b", "x", 2), ("c", "y", 3)]))
    table.delete(F.col("cat") == "x")  # S6 predicate delete
    assert [r.k for r in table.read().collect()] == ["c"]
    table.delete_by_keys(spark.createDataFrame([("c",)], "k string"), keys=["k"])  # S5
    assert table.read().count() == 0


def test_versions_advance_and_vacuum(spark, table):
    for i in range(4):
        table.append(_df(spark, [(f"r{i}", "x", i)]))
    assert table.current_version() == 3
    # vacuum keeps only the trailing versions
    dirs = [d for d in os.listdir(table.path) if d.startswith("v_")]
    assert len(dirs) <= 2


def test_transaction_messages_first_session_last(spark, tmp_path):
    """S7 (MongoDbService.cs:563-592): both tables committed, same txn_id
    stamped on both, messages committed BEFORE the session pointer so
    session-driven readers never see a half-written exchange."""
    sessions = ManagedTable(spark, str(tmp_path / "s"))
    messages = ManagedTable(spark, str(tmp_path / "m"))
    sessions.overwrite(spark.createDataFrame([("s1", 0)], "session_id string, tokens_used int"))
    messages.overwrite(
        spark.createDataFrame([], "id string, session_id string, text string")
    )
    txn = TransactionalWriter(sessions, messages)
    txn.upsert_session_batch(
        spark.createDataFrame([("s1", 42)], "session_id string, tokens_used int"),
        spark.createDataFrame(
            [("m1", "s1", "hi"), ("m2", "s1", "yo")], "id string, session_id string, text string"
        ),
        session_keys=["session_id"],
        message_keys=["id"],
        txn_id="txn-1",
    )
    srow = sessions.read().collect()
    mrows = messages.read().collect()
    assert srow[0].tokens_used == 42 and srow[0].txn_id == "txn-1"
    assert {r.id for r in mrows} == {"m1", "m2"}
    assert all(r.txn_id == "txn-1" for r in mrows)


def test_transaction_retry_is_idempotent(spark, tmp_path):
    """Keyed merges make a crashed-and-retried transaction converge instead
    of duplicating messages."""
    sessions = ManagedTable(spark, str(tmp_path / "s"))
    messages = ManagedTable(spark, str(tmp_path / "m"))
    sessions.overwrite(spark.createDataFrame([("s1", 0)], "session_id string, tokens_used int"))
    messages.overwrite(spark.createDataFrame([], "id string, session_id string, text string"))
    txn = TransactionalWriter(sessions, messages)
    s_row = spark.createDataFrame([("s1", 7)], "session_id string, tokens_used int")
    m_rows = spark.createDataFrame([("m1", "s1", "hi")], "id string, session_id string, text string")
    for _ in range(2):  # retry of the same logical transaction
        txn.upsert_session_batch(s_row, m_rows, ["session_id"], ["id"], txn_id="txn-9")
    assert messages.read().count() == 1
    assert sessions.read().first().tokens_used == 7


def test_time_travel_read(spark, tmp_path):
    t = ManagedTable(spark, str(tmp_path / "tt"))
    t.overwrite(spark.createDataFrame([(1, "a")], ["id", "val"]))          # v0
    t.merge(spark.createDataFrame([(1, "b"), (2, "c")], ["id", "val"]), ["id"])  # v1
    v0 = sorted(tuple(r) for r in t.read(version=0).collect())
    v1 = sorted(tuple(r) for r in t.read().collect())
    assert v0 == [(1, "a")]
    assert v1 == [(1, "b"), (2, "c")]
    with pytest.raises(ValueError):
        t.read(version=99)
    # a vacuumed version reports clearly rather than a raw path error
    t.delete(F.col("id") == 2)  # v2; default vacuum keeps last 2 -> v0 gone
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.read(version=0)
    assert sorted(tuple(r) for r in t.read(version=1).collect()) == v1
