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
session/message tables this backs (the reference's operational data).

For tables too big to rewrite per commit, `BucketedTable` is the scale
layout: rows hash-bucketed on the merge key, a per-version JSON manifest
maps bucket -> parquet dirs, and a keyed MERGE/DELETE rewrites ONLY the
buckets containing touched keys (file-level COW, the same idea as
Delta/Iceberg file rewrite but with hash pruning instead of stats). An
upsert of B rows into a T-row table costs O(T/n_buckets * distinct_buckets(B)),
not O(T).

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
    def read(self, version: int | None = None) -> DataFrame:
        """Read the current committed version, or TIME-TRAVEL to an older
        one (`version=N`): every commit is a complete immutable snapshot
        dir, so any version the vacuum horizon still retains (`_vacuum`
        keeps the last `keep`) reads exactly as it was committed — the
        Delta `versionAsOf` analog, free with the snapshot-COW layout.
        Useful for reproducing a training run against the corpus snapshot
        it actually saw, and for auditing a bad write."""
        cur = self.current_version()
        if cur < 0:
            raise FileNotFoundError(f"table {self.path} has no committed version")
        v = cur if version is None else version
        if not 0 <= v <= cur:
            raise ValueError(f"version {v} out of range [0, {cur}]")
        d = self._data_dir(v)
        if not os.path.exists(d):
            raise FileNotFoundError(
                f"version {v} was vacuumed (oldest retained snapshot wins); "
                f"current={cur}"
            )
        return self.spark.read.parquet(d)

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


class BucketedTable:
    """File-level-COW mutable table: hash-bucketed on `bucket_by`, keyed
    mutations rewrite only affected buckets.

    Layout:
        <root>/v_<n>/_bucket=<i>/part-*.parquet   data written AT version n
        <root>/manifest_<n>.json                  bucket -> dir list
        <root>/_VERSION                           atomic pointer to n

    A bucket's dir LIST supports cheap appends (new file added to the list,
    nothing rewritten); merge/delete_by_keys compact the affected buckets'
    lists back to one dir. Readers resolve the manifest to a flat path list
    — always a complete committed version.

    The bucket column is Spark's murmur3 `hash()` pmod n_buckets: internal
    layout only, never part of query semantics (so no oracle-portability
    constraint). Same key -> same bucket is all correctness needs."""

    BUCKET_COL = "_bucket"

    def __init__(self, spark: SparkSession, path: str, bucket_by: list[str], n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.bucket_by = list(bucket_by)
        self.n_buckets = n_buckets
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

    def exists(self) -> bool:
        return self.current_version() >= 0

    def _manifest_doc(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.path, f"manifest_{v}.json")) as f:
            return json.load(f)

    def _manifest(self, version: int | None = None) -> dict[str, list[str]]:
        return self._manifest_doc(version)["buckets"]

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.BUCKET_COL, F.pmod(F.hash(*self.bucket_by), F.lit(self.n_buckets))
        )

    def _write_version(self, df: DataFrame, version: int) -> dict[int, str]:
        """Write df (already bucket-stamped) partitioned by bucket; returns
        {bucket: dir} for the buckets actually written."""
        target = os.path.join(self.path, f"v_{version}")
        (
            df.repartition(self.n_buckets, F.col(self.BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(self.BUCKET_COL)
            .parquet(target)
        )
        out = {}
        for name in os.listdir(target):
            if name.startswith(f"{self.BUCKET_COL}="):
                b = int(name.split("=", 1)[1])
                out[b] = os.path.join(target, name)
        return out

    def _commit(
        self, buckets: dict[str, list[str]], version: int, op: str, schema_json: str | None = None
    ) -> int:
        if schema_json is None and version > 0:
            schema_json = self._manifest_doc(version - 1).get("schema")
        with open(os.path.join(self.path, f"manifest_{version}.json"), "w") as f:
            json.dump(
                {"buckets": buckets, "op": op, "ts": time.time(), "schema": schema_json}, f
            )
        tmp = self._version_file() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._version_file())
        self._vacuum(keep=2)
        return version

    def _vacuum(self, keep: int = 2) -> None:
        """Drop version dirs no manifest in the keep-window references."""
        cur = self.current_version()
        live: set[str] = set()
        for v in range(max(0, cur - keep + 1), cur + 1):
            try:
                for dirs in self._manifest(v).values():
                    for d in dirs:
                        live.add(os.path.normpath(d).split(f"{os.sep}{self.BUCKET_COL}=")[0])
            except FileNotFoundError:
                continue
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("v_") and int(name[2:]) <= cur - keep and full not in live:
                shutil.rmtree(full, ignore_errors=True)
            if name.startswith("manifest_") and int(name[9:-5]) <= cur - keep:
                os.remove(full)

    # ---- reads ----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Read the current committed version, or time-travel to any older
        version whose manifest survives the vacuum window (`_vacuum` keeps
        the last `keep` manifests and every file they reference) — the
        manifest IS the snapshot, so file-level COW gives versionAsOf for
        free, same contract as ManagedTable.read(version=)."""
        cur = self.current_version()
        if cur < 0:
            raise FileNotFoundError(f"table {self.path} has no committed version")
        v = cur if version is None else version
        if not 0 <= v <= cur:
            raise ValueError(f"version {v} out of range [0, {cur}]")
        try:
            doc = self._manifest_doc(v)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"version {v} was vacuumed (manifest gone); current={cur}"
            ) from None
        paths = [d for dirs in doc["buckets"].values() for d in dirs]
        if not paths:  # fully-deleted table: empty frame with the last schema
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(doc["schema"]))
            empty = self.spark.createDataFrame([], schema)
            return empty.drop(self.BUCKET_COL) if self.BUCKET_COL in empty.columns else empty
        return self.spark.read.parquet(*paths).drop(self.BUCKET_COL)

    def _read_buckets(self, manifest: dict[str, list[str]], buckets: list[int]) -> DataFrame | None:
        paths = [d for b in buckets for d in manifest.get(str(b), [])]
        if not paths:
            return None
        return self.spark.read.parquet(*paths).drop(self.BUCKET_COL)

    # ---- writes ---------------------------------------------------------
    def overwrite(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        stamped = self._with_bucket(df)
        written = self._write_version(stamped, v)
        return self._commit(
            {str(b): [d] for b, d in written.items()}, v, "overwrite", stamped.schema.json()
        )

    def append(self, df: DataFrame) -> int:
        """S3: pure file add — NO existing data is read or rewritten; the
        new files join the affected buckets' dir lists."""
        v = self.current_version() + 1
        stamped = self._with_bucket(df)
        written = self._write_version(stamped, v)
        buckets = {k: list(vv) for k, vv in (self._manifest() if self.exists() else {}).items()}
        for b, d in written.items():
            buckets.setdefault(str(b), []).append(d)
        return self._commit(buckets, v, "append", stamped.schema.json())

    def _affected_buckets(self, source: DataFrame) -> list[int]:
        rows = self._with_bucket(source).select(self.BUCKET_COL).distinct().collect()
        return sorted(r[0] for r in rows)

    def merge(self, source: DataFrame, keys: list[str] | None = None) -> int:
        """S4 MERGE: rewrites ONLY the buckets containing source keys —
        O(touched buckets), not O(table). `keys` defaults to bucket_by and
        must contain it (rows with equal keys must share a bucket)."""
        keys = keys or self.bucket_by
        assert set(self.bucket_by) <= set(keys), "merge keys must cover bucket_by"
        if not self.exists():
            return self.overwrite(source)
        manifest = {k: list(v) for k, v in self._manifest().items()}
        affected = self._affected_buckets(source)
        old = self._read_buckets(manifest, affected)
        if old is not None:
            remaining = old.join(source.select(*keys), on=keys, how="left_anti")
            merged = remaining.unionByName(source, allowMissingColumns=True)
        else:
            merged = source
        v = self.current_version() + 1
        written = self._write_version(self._with_bucket(merged), v)
        for b in affected:
            manifest[str(b)] = [written[b]] if b in written else []
        return self._commit(manifest, v, "merge")

    def delete_by_keys(self, source: DataFrame, keys: list[str] | None = None) -> int:
        """S5: point deletes, bucket-pruned like merge."""
        keys = keys or self.bucket_by
        assert set(self.bucket_by) <= set(keys), "delete keys must cover bucket_by"
        manifest = {k: list(v) for k, v in self._manifest().items()}
        affected = self._affected_buckets(source)
        old = self._read_buckets(manifest, affected)
        v = self.current_version() + 1
        manifest_update: dict[str, list[str]] = {str(b): [] for b in affected}
        if old is not None:
            remaining = self._with_bucket(old.join(source.select(*keys), on=keys, how="left_anti"))
            written = self._write_version(remaining, v)
            for b in affected:
                manifest_update[str(b)] = [written[b]] if b in written else []
        manifest.update(manifest_update)
        return self._commit(manifest, v, "delete-keys")

    def compact(self, min_dirs: int = 2) -> int:
        """Maintenance (the OPTIMIZE analog): rewrite every bucket whose
        dir LIST has grown to >= min_dirs entries (each append adds one)
        back to a single dir; already-compact buckets carry forward
        untouched. Semantics-preserving, O(touched buckets), committed as a
        normal version so concurrent readers keep a complete snapshot.
        At 100 TB this is the periodic job that keeps per-bucket file
        counts — and therefore scan listing/open cost — bounded no matter
        how append-heavy the workload is."""
        if not self.exists():
            raise FileNotFoundError(f"table {self.path} has no committed version")
        manifest = {k: list(v) for k, v in self._manifest().items()}
        todo = sorted(int(b) for b, dirs in manifest.items() if len(dirs) >= min_dirs)
        if not todo:
            return self.current_version()
        old = self._read_buckets(manifest, todo)
        v = self.current_version() + 1
        written = self._write_version(self._with_bucket(old), v)
        for b in todo:
            manifest[str(b)] = [written[b]] if b in written else []
        return self._commit(manifest, v, "compact")

    def delete(self, predicate) -> int:
        """S6: arbitrary-predicate delete — no key to prune on, so this one
        IS a full rewrite (Delta without stats pays the same; predicate
        deletes on huge tables want a partition/zorder column instead)."""
        target = self.read()
        v = self.current_version() + 1
        written = self._write_version(
            self._with_bucket(target.filter(~predicate | predicate.isNull())), v
        )
        return self._commit({str(b): [d] for b, d in written.items()}, v, "delete")


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
