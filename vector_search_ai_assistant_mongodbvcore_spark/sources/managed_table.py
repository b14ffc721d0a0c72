"""Versioned mutable tables over parquet: the engine's operational store.

The reference's operational store is MongoDB vCore with upserts, point and
predicate deletes, and one multi-statement transaction
(/root/reference/SharedLib/Services/MongoDbService.cs:241-293 upsert/delete,
:563-592 transaction, :598-613 predicate delete).

Spark-first equivalent is Delta Lake's MERGE INTO / DELETE FROM; delta-spark
is not installed here, so this module implements the minimal subset as an
explicit MVCC commit log — the same architecture (immutable data files +
atomic pointer swap), so it swaps for Delta/Iceberg on a real cluster without
changing callers:

    <root>/v_<n>/part-*.parquet     immutable snapshot data
    <root>/_VERSION                 atomic pointer (rename) to current n

Every mutation = read current snapshot -> compute new table -> write v_{n+1}
-> atomically swap pointer. Readers always see a complete committed version.
Copy-on-write at snapshot granularity is O(table) per commit — fine for the
session/message tables this backs (the reference's operational data), while
the 100 TB analytical tables stay append-only parquet/Delta where Spark's
file-level COW applies.

Concurrency: single-writer (the harness); a real deployment gets optimistic
concurrency from Delta. Atomicity of the pointer swap relies on POSIX rename.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManagedTable:
    """A named, versioned, mutable table rooted at `path`."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ---- commit log -----------------------------------------------------
    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._version_file()) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return -1

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v_{version}")

    def exists(self) -> bool:
        return self.current_version() >= 0

    def _commit(self, df: DataFrame, mode_note: str) -> int:
        new_v = self.current_version() + 1
        target = self._data_dir(new_v)
        df.write.mode("overwrite").parquet(target)
        tmp = self._version_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": new_v, "ts": time.time(), "op": mode_note}, f)
        os.replace(tmp, self._version_file())  # atomic pointer swap
        self._vacuum(keep=2)
        return new_v

    def _vacuum(self, keep: int = 2) -> None:
        cur = self.current_version()
        for name in os.listdir(self.path):
            if name.startswith("v_"):
                v = int(name[2:])
                if v <= cur - keep:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    # ---- reads ----------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.path} has no committed version")
        return self.spark.read.parquet(self._data_dir(v))

    # ---- writes ---------------------------------------------------------
    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df, "overwrite")

    def append(self, df: DataFrame) -> int:
        """S3: row insert."""
        if self.exists():
            df = self.read().unionByName(df, allowMissingColumns=True)
        return self._commit(df, "append")

    def merge(self, source: DataFrame, keys: list[str]) -> int:
        """S4: keyed upsert — MERGE INTO ... WHEN MATCHED UPDATE ALL WHEN NOT
        MATCHED INSERT ALL, with equality on `keys` (the reference uses the
        compound (categoryId, _id) key, MongoDbService.cs:254-258)."""
        if not self.exists():
            return self._commit(source, "merge-init")
        target = self.read()
        # rows in target not matched by source + all source rows
        remaining = target.join(source.select(*keys), on=keys, how="left_anti")
        merged = remaining.unionByName(source, allowMissingColumns=True)
        return self._commit(merged, "merge")

    def delete(self, predicate) -> int:
        """S5/S6: DELETE WHERE predicate (a Column)."""
        target = self.read()
        return self._commit(target.filter(~predicate | predicate.isNull()), "delete")

    def delete_by_keys(self, source: DataFrame, keys: list[str]) -> int:
        """Point deletes by key set (anti-join)."""
        target = self.read()
        return self._commit(target.join(source.select(*keys), on=keys, how="left_anti"), "delete-keys")


class TransactionalWriter:
    """S7: the reference's multi-write transaction (replace 1 session +
    insert 2 messages, MongoDbService.cs:563-592) across two ManagedTables.

    Cross-table atomicity protocol (SURVEY.md §7 hard part 2): write the
    MESSAGES commit first, SESSION commit last, and stamp both with txn_id.
    Readers that key off session state (as the reference UI does — it lists
    sessions, then loads messages) never observe a session whose messages are
    missing. A crash between the two commits leaves orphan messages invisible
    to session-driven readers; they are idempotently overwritten on retry
    because all writes are keyed MERGEs."""

    def __init__(self, sessions: ManagedTable, messages: ManagedTable):
        self.sessions = sessions
        self.messages = messages

    def upsert_session_batch(
        self,
        session_row: DataFrame,
        message_rows: DataFrame,
        session_keys: list[str] | None = None,
        message_keys: list[str] | None = None,
        txn_id: str | None = None,
    ) -> None:
        import uuid

        txn = txn_id or str(uuid.uuid4())
        message_rows = message_rows.withColumn("txn_id", F.lit(txn))
        session_row = session_row.withColumn("txn_id", F.lit(txn))
        self.messages.merge(message_rows, message_keys or ["id"])
        self.sessions.merge(session_row, session_keys or ["session_id"])
