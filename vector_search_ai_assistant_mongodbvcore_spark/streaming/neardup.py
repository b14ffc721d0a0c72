"""Streaming NEAR-duplicate filtering for continuous corpus ingest.

Completes the dedup tier's batch/stream symmetry: batch has exact +
MinHash-LSH fuzzy dedup (operators/dedup.py, wired into
prepare_training_corpus); streaming had exact only (streaming/dedup.py).
This module adds the fuzzy form with the GREEDY keep policy — the one
near-dup policy that is streamable, because its verdict for a document
depends only on documents that arrived BEFORE it (component/best-quality
policies need the full pair graph and remain batch).

Why not a pure transformation like dedup_stream: a document is a near-dup
iff ANY of its `bands` LSH band keys was seen before, which needs a
per-key state probe (dropDuplicates-like) FOLLOWED by a per-doc
all-bands-new aggregation — two stateful operators chained on the keys'
explode, which append mode cannot express. So this uses the engine's
established incremental-index pattern (streaming/incremental.py): a
foreachBatch sink backed by a PERSISTED band-key store.

Store layout: BucketedTable bucketed on `key` holding one row per
(band, key, doc_id, batch, run, seq) — every band key of every document EVER SEEN
(survivor or not; greedy batch semantics drop a doc colliding with a
lower-id doc even when that doc itself was dropped, so dropped docs'
keys still poison later arrivals — parity pinned in tests). Writes are
INSERT-IF-ABSENT on (band, key, doc_id): an existing row keeps its
ORIGINAL (run, batch) stamp forever — re-stamping would hide a
re-arriving doc's own history from the replay probe (which excludes
rows stamped with the current run's current batch id; the run id is
minted per CHECKPOINT by run_id_for_checkpoint, so a fresh checkpoint
restarting epochs at 0 against the same store never collides with a
prior run's batch-0 stamps), so both a replayed micro-batch and a
doc_id re-arriving batches later recompute the identical survivor set
(exactly-once under retries, pinned in tests).

Equivalence contract (pinned in tests): streaming micro-batches in id
order through neardup_filter_batch, unioned, equals batch
drop_near_duplicates(df, minhash_lsh_pairs(df)) — same hash family, same
band layout (operators/dedup.minhash_band_keys), same greedy policy.

Scale: the store is an index table — `bands` rows per document, the same
growth class as the incremental BM25/LSH indexes; the per-batch probe is
one keyed join of the batch's band keys (tiny) against the store, and
the store merge rewrites only the buckets holding the batch's keys
(file-level COW). At 100 TB the store rides the same bucketed layout the
other incremental indexes use.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
    capped_bucket_pairs,
    minhash_band_keys,
)
from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
    BucketedTable,
)

__all__ = [
    "open_neardup_store",
    "neardup_filter_batch",
    "start_neardup_dedup_stream",
    "open_embedding_neardup_store",
    "embedding_neardup_filter_batch",
    "start_embedding_neardup_stream",
    "run_id_for_checkpoint",
    "evict_neardup_history",
    "next_seq_base",
    "seq_base_for_checkpoint",
]


def open_neardup_store(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> BucketedTable:
    """The persisted band-key store (see module docstring)."""
    return BucketedTable(spark, path, bucket_by=["key"], n_buckets=n_buckets)


def evict_neardup_history(store: BucketedTable, before_seq: int) -> int:
    """Bound the store for INFINITE streams: drop every row stamped with
    seq < before_seq — the band-key analog of
    dedup_stream_watermarked's state eviction. After eviction, documents
    seen only before the horizon no longer poison new arrivals: the
    dedup guarantee is scoped to the retained history, exactly like the
    watermark trade on the exact-dedup state store. The write side rides
    delete_where's stats pruning (buckets whose files cannot hold
    sub-horizon stamps carry forward untouched).

    `seq` is a MONOTONE age stamp spanning runs (run_base + epoch, see
    next_seq_base) — eviction cannot key on raw batch ids, which restart
    at 0 with every fresh checkpoint while the store retains the prior
    run's high-numbered stamps (a batch-keyed horizon would then retain
    the ENTIRE prior run until the new counter caught up). Stores
    written before the seq column existed evict on `batch` (their single
    run makes the two equivalent).

    Replay caveat (documented, same class as any state eviction): a
    micro-batch replayed from BEFORE the horizon recomputes against the
    evicted store and may keep docs the original run dropped — keep the
    eviction lag (max_history_batches) much larger than the deepest
    replay Structured Streaming can issue (in practice: one batch)."""
    if "seq" in _store_columns(store):
        # legacy rows written before the seq column read as NULL and
        # delete_where keeps NULL-evaluating rows — purge them explicitly
        # (they are by definition older than any stamped horizon; the
        # bounded-store contract outranks their history)
        store.delete_where([("seq", "is_null", None)])
        return store.delete_where([("seq", "<", int(before_seq))])
    return store.delete_where([("batch", "<", int(before_seq))])


def _store_columns(store: BucketedTable) -> "set[str]":
    """Column names of the store's CURRENT committed schema, read from
    the manifest doc (one small json, no parquet schema inference —
    this runs on the per-batch eviction hot path). The manifest schema
    is the LAST write's schema, which is exactly the right dispatch
    key: once any new-code batch has written, `seq` exists."""
    import json as _json

    doc = store._manifest_doc()
    sch = doc.get("schema")
    if sch:
        return {f["name"] for f in _json.loads(sch)["fields"]}
    return set(store.read().columns)  # pre-schema manifest: one-off fallback


def next_seq_base(store: BucketedTable) -> int:
    """One past the largest age stamp already in the store (0 for a
    fresh store). Use seq_base_for_checkpoint in streaming sinks — the
    base must be FROZEN per checkpoint, not recomputed per (re)start:
    epoch counters RESUME on a same-checkpoint restart, and re-adding a
    fresh max+1 base to a resumed epoch would double-count and
    over-evict in-horizon history."""
    if not store.exists():
        return 0
    df = store.read()
    col = "seq" if "seq" in _store_columns(store) else "batch"
    m = df.agg(F.max(col).alias("m")).collect()[0]["m"]
    return int(m) + 1 if m is not None else 0


def seq_base_for_checkpoint(checkpoint_dir: str, store: BucketedTable) -> int:
    """The checkpoint's FROZEN seq base: minted once (next_seq_base at
    first start) and persisted beside the run-id marker, so cur_seq =
    base + epoch stays consistent across same-checkpoint restarts (the
    epoch counter resumes) and only a checkpoint wipe — which also
    restarts epochs at 0 — mints a new base above the prior run's
    stamps."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "NEARDUP_SEQ_BASE")
    try:
        with open(marker) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pass
    base = next_seq_base(store)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(base))
    os.replace(tmp, marker)
    return base


def run_id_for_checkpoint(checkpoint_dir: str) -> str:
    """Stable run identity tied to a streaming CHECKPOINT's lifetime.

    The replay-exclusion probe must ignore exactly the rows the CURRENT
    micro-batch stamped on a previous (failed) attempt — identified by
    (run, batch), not batch alone: Structured Streaming epoch ids restart
    at 0 whenever the checkpoint is wiped or a new query starts from a
    fresh checkpoint against the same store, and a bare batch==0 probe
    would then hide the PREVIOUS run's batch-0 stamps from the new run's
    batch 0, silently changing survivor sets. The id is minted once per
    checkpoint (a marker file inside checkpoint_dir): restarting the same
    query resumes both the epoch counter and the id; deleting the
    checkpoint rotates the id, so prior-run stamps stay visible history.
    Corollary: the STORE outlives checkpoints by design (it is the dedup
    history), but a checkpoint must never outlive its store — wiping
    store_path without wiping checkpoint_dir replays already-committed
    batches against an empty history."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "NEARDUP_RUN_ID")
    try:
        with open(marker) as f:
            rid = f.read().strip()
            if rid:
                return rid
    except FileNotFoundError:
        pass
    import uuid

    rid = str(uuid.uuid4())
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(rid)
    os.replace(tmp, marker)
    return rid


def _current_attempt(prior: DataFrame, run_id: str, batch_id: int):
    """Predicate selecting rows stamped by THIS (run, batch) attempt —
    the rows a foreachBatch replay must not see as history. Stores
    written before the run column existed read as NULL run: never the
    current attempt."""
    run = F.coalesce(F.col("run"), F.lit("")) if "run" in prior.columns else F.lit("")
    return (run == F.lit(run_id)) & (F.col("batch") == F.lit(int(batch_id)))


def neardup_filter_batch(
    batch: DataFrame,
    store: BucketedTable,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
    max_bucket: int = 10_000,
    run_id: str = "",
    seq: "int | None" = None,
) -> DataFrame:
    """One micro-batch of greedy streaming near-dedup; returns the
    SURVIVING rows of `batch` (all original columns) and upserts the
    batch's band keys into the store.

    Verdict for a batch doc d:
      * drop if any of d's band keys exists in the store from an EARLIER
        batch (first-arrival wins across batches), else
      * drop if d shares a band key with a LOWER-id doc of this batch
        (greedy within the batch — drop_near_duplicates on the batch's
        own LSH candidate pairs), else keep.
    Rows stamped with the CURRENT (run, batch) attempt are ignored by the
    probe and existing rows are never re-stamped (insert-if-absent), so a
    foreachBatch replay — and a doc re-arriving in a later batch —
    recompute the identical survivors (idempotent). `run_id`
    (run_id_for_checkpoint) scopes that exclusion to THIS query's
    checkpoint lifetime: a fresh checkpoint restarting epoch ids at 0
    cannot collide with a prior run's batch-0 stamps."""
    banded = minhash_band_keys(
        batch, text_col, id_col, num_hashes, bands, shingle_size
    ).persist()
    try:
        prior = store.read() if store.exists() else None
        collided = None
        if prior is not None:
            # join the batch's TINY key set against the store as-is — no
            # store-side distinct (an O(store) shuffle per batch);
            # duplicate collided ids collapse in the drop-set distinct
            earlier = prior.filter(~_current_attempt(prior, run_id, batch_id))
            collided = banded.join(
                earlier.select("band", "key"), ["band", "key"]
            ).select(id_col)
        in_batch_pairs = capped_bucket_pairs(banded, ["band", "key"], id_col, max_bucket)
        drop_ids = in_batch_pairs.select(F.col("id_b").alias(id_col))
        if collided is not None:
            drop_ids = drop_ids.unionByName(collided)
        # one id frame bounded by the batch size, lineage TRUNCATED so the
        # survivors the caller materializes later never recompute the
        # minhash aggregation after banded is unpersisted below
        drop_ids = drop_ids.distinct().localCheckpoint(eager=True)
        # EVERY batch doc's keys enter the store (greedy semantics: a
        # dropped doc's keys still poison later arrivals) — but
        # INSERT-IF-ABSENT only: re-stamping an existing (band, key, doc)
        # row with the current attempt would hide a re-arriving doc's
        # own history from the replay probe and break the exactly-once
        # contract
        rows = banded.select(
            id_col,
            "band",
            "key",
            F.lit(int(batch_id)).alias("batch"),
            F.lit(run_id).alias("run"),
            # monotone cross-run age stamp for history eviction (see
            # evict_neardup_history); defaults to the batch id for
            # single-run callers
            F.lit(int(seq if seq is not None else batch_id)).alias("seq"),
        )
        if prior is not None:
            fresh = rows.join(
                prior.select("band", "key", id_col),
                ["band", "key", id_col],
                "left_anti",
            )
            store.merge(fresh, keys=["band", "key", id_col])
        else:
            store.overwrite(rows)
        return batch.join(drop_ids, id_col, "left_anti")
    finally:
        banded.unpersist()


def start_neardup_dedup_stream(
    docs: DataFrame,
    out_dir: str,
    store_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
    store_buckets: int = 16,
    max_history_batches: "int | None" = None,
):
    """foreachBatch sink: near-dedup filter each micro-batch against the
    persisted store, land survivors at out_dir/batch=<id>/ (dynamic-
    partition overwrite on the deterministic batch id — a replayed batch
    replaces exactly its own partition, the shard-export discipline).
    `max_history_batches` bounds the store for infinite streams
    (evict_neardup_history — watermark-style scoped dedup)."""
    spark = docs.sparkSession
    run_id = run_id_for_checkpoint(checkpoint_dir)
    seq_base = (
        seq_base_for_checkpoint(
            checkpoint_dir,
            open_neardup_store(spark, store_path, n_buckets=store_buckets),
        )
        if max_history_batches is not None
        else 0
    )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        store = open_neardup_store(spark, store_path, n_buckets=store_buckets)
        cur_seq = seq_base + int(epoch_id)
        kept = neardup_filter_batch(
            df, store, int(epoch_id), text_col, id_col,
            num_hashes, bands, shingle_size, run_id=run_id, seq=cur_seq,
        )
        (
            kept.withColumn("batch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )
        if max_history_batches is not None and cur_seq >= max_history_batches:
            evict_neardup_history(store, cur_seq - max_history_batches + 1)

    os.makedirs(checkpoint_dir, exist_ok=True)
    return (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---- embedding-space form (incremental SemDeDup) --------------------------
#
# Same shape as the text form, with sign-LSH buckets over the embedding
# column as the blocking key and EXACT cosine verification of candidates
# (the text form accepts LSH candidates; vectors are cheap to verify, so
# this form never drops on a bucket collision alone). The store holds
# (table, bucket, vec_id, vector, batch) for every SEEN doc — the same
# growth class as the incremental LshIndex; int8=True stores vectors
# quantized (functions/vector.quantize_int8, the 4x storage/IO cut) and
# dequantizes inside the probe's scan projection, trading the documented
# bounded quantization error on near-threshold cosines.
# Cosine is the codegen expression on the probe side and
# numpy inside the batch operator's verification — they agree to float
# ulps, so thresholds should not sit ON a pair's exact cosine (the same
# caveat embedding_neardup documents for its own dual kernels).


def open_embedding_neardup_store(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> BucketedTable:
    return BucketedTable(spark, path, bucket_by=["bucket"], n_buckets=n_buckets)


def embedding_neardup_filter_batch(
    batch: DataFrame,
    store: BucketedTable,
    batch_id: int,
    dims: int,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    int8: bool = False,
    run_id: str = "",
    seq: "int | None" = None,
) -> DataFrame:
    """One micro-batch of greedy streaming EMBEDDING near-dedup; returns
    surviving rows (NULL-vector rows always survive — no evidence is not
    a duplicate verdict, the semdedup NULL guard). Drop iff exact cosine
    >= threshold against an earlier-batch doc sharing any (table, bucket)
    OR against a lower-id doc of this batch (greedy via the batch
    operator embedding_neardup — identical hyperplanes, same seed).
    `run_id` scopes replay exclusion to this checkpoint's lifetime (see
    run_id_for_checkpoint)."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.vector import (
        cosine_similarity,
        dequantize_int8,
        quantize_int8,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
        embedding_neardup,
        lsh_bucket_ids,
    )

    vec = batch.filter(F.col(vector_col).isNotNull())
    coded = lsh_bucket_ids(
        vec, dims, bits=bits, tables=tables,
        vector_col=vector_col, id_col=id_col, seed=seed,
    )
    banded = coded.join(vec.select(id_col, vector_col), id_col).persist()
    try:
        prior = store.read() if store.exists() else None
        collided = None
        if prior is not None:
            earlier = prior.filter(~_current_attempt(prior, run_id, batch_id))
            pv = (
                dequantize_int8(F.col("vector"))
                if int8
                else F.col("vector")
            )
            cand = banded.join(
                earlier.select("table", "bucket", pv.alias("_pv")),
                ["table", "bucket"],
            )
            collided = cand.filter(
                cosine_similarity(F.col(vector_col), F.col("_pv"))
                >= F.lit(threshold)
            ).select(id_col)
        pairs = embedding_neardup(
            vec, threshold=threshold, bits=bits, tables=tables,
            vector_col=vector_col, id_col=id_col, seed=seed,
        )
        drop_ids = pairs.select(F.col("id_b").alias(id_col))
        if collided is not None:
            drop_ids = drop_ids.unionByName(collided)
        # bounded by the batch size, lineage truncated (see text form)
        drop_ids = drop_ids.distinct().localCheckpoint(eager=True)
        stored = (
            quantize_int8(F.col(vector_col)) if int8 else F.col(vector_col)
        )
        rows = banded.select(
            "table", "bucket", id_col,
            stored.alias("vector"),
            F.lit(int(batch_id)).alias("batch"),
            F.lit(run_id).alias("run"),
            F.lit(int(seq if seq is not None else batch_id)).alias("seq"),
        )
        if prior is not None:
            # insert-if-absent, same replay/re-arrival argument as the
            # text form
            fresh = rows.join(
                prior.select("table", "bucket", id_col),
                ["table", "bucket", id_col],
                "left_anti",
            )
            store.merge(fresh, keys=["table", "bucket", id_col])
        else:
            store.overwrite(rows)
        return batch.join(drop_ids, id_col, "left_anti")
    finally:
        banded.unpersist()


def start_embedding_neardup_stream(
    docs: DataFrame,
    out_dir: str,
    store_path: str,
    checkpoint_dir: str,
    dims: int,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    store_buckets: int = 16,
    int8: bool = False,
    max_history_batches: "int | None" = None,
):
    """foreachBatch sink for the embedding form — same exactly-once and
    bounded-history discipline as start_neardup_dedup_stream."""
    spark = docs.sparkSession
    run_id = run_id_for_checkpoint(checkpoint_dir)
    seq_base = (
        seq_base_for_checkpoint(
            checkpoint_dir,
            open_embedding_neardup_store(spark, store_path, n_buckets=store_buckets),
        )
        if max_history_batches is not None
        else 0
    )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        store = open_embedding_neardup_store(
            spark, store_path, n_buckets=store_buckets
        )
        cur_seq = seq_base + int(epoch_id)
        kept = embedding_neardup_filter_batch(
            df, store, int(epoch_id), dims, threshold,
            bits, tables, vector_col, id_col, seed, int8, run_id=run_id,
            seq=cur_seq,
        )
        (
            kept.withColumn("batch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )
        if max_history_batches is not None and cur_seq >= max_history_batches:
            evict_neardup_history(store, cur_seq - max_history_batches + 1)

    os.makedirs(checkpoint_dir, exist_ok=True)
    return (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
