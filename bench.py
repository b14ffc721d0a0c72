"""Benchmark: headline engine queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}.

Queries execute to completion via the noop sink (full plan runs, nothing
collected to the driver except intrinsic top-k results).

Timing protocol (since r9): each query runs ONE untimed warm pass, then
the timed pass — the same warm-then-measure discipline
tools/scale_probe.py uses. Two judge sessions in a row had to re-run the
cold protocol to separate code changes from this box's documented
±20-40% wall-clock drift (OS page cache, JIT, shuffle-dir reuse); the
warm pass absorbs that variance so round-over-round deltas track plan
changes, not box state. `value` is the sum of the TIMED passes only —
r9+ totals are therefore not directly comparable to the cold r1-r8
totals (expect a lower, more stable number).

Since r12 (judge r11 directive #5) each query's timed pass runs THREE
times and the recorded per-query number is the MEDIAN — BENCH_HISTORY.md
proved ±12% same-code drift between single samples, wide enough to smear
round-over-round comparisons. `value` is the sum of medians; the raw
samples ride along under "samples" so a judge can see the spread.

Since r14 (judge r13 directive #4) the MIN of the three samples is
persisted alongside: "value_min" (sum of per-query minima) and
"queries_min". The median within one run still can't see MACHINE-LOAD
drift between runs (BENCH_r13.json's recorded run read 22% above the
same-code closing run hours apart); the min is the load-robust statistic
— background load only ever ADDS wall time, so min-of-samples converges
on the true plan cost and is the number to compare across runs.  Each
BENCH_HISTORY row records the protocol that produced it.

The DEFAULT since r14 is the INTERLEAVED protocol: warm every query
once, then 3 full passes over the list (one timed execution per query
per pass) — same execution count as the old consecutive protocol, just
reordered. Four r14 idle back-to-back consecutive-protocol runs measured
this shared host swinging ±25% on minutes-long load regimes — longer
than one query's 3 consecutive samples, so even their min carried a
spike; interleaving spreads each query's samples across the whole run's
regimes. Measured: back-to-back interleaved runs differ 0.6% on
value_min (vs 10-24% consecutive). SPARK_GRAFT_BENCH_PASSES overrides
the pass count; =0 restores the consecutive r12 protocol.

"sql_serves" (judge r11 directive #8) times the raw-SQL-served
quantized-IVF and LSH top-k paths (plans/sql_rewrite whole-query serve,
shortlist + exact rerank) — NOT registry slots (their bit-parity is
pinned in tests/test_sql_rewrite.py), just timing rows so a serving
regression is visible round over round. Excluded from `value` to keep
the headline total comparable with earlier rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship retrieval path + one per operator family.
# embedding_neardup_pairs (quadratic oracle baseline) is deliberately
# excluded — lsh_neardup_pairs is the scale path.
BENCH_QUERIES = [
    "pricing_summary",
    "events_conjunctive_filter",
    "conversation_window_events",
    "payload_concat_by_source",
    "text_stats",
    "cleaned_corpus",
    "language_id_pred",
    "dedup_corpus_exact",
    "remove_duplicated_spans",
    "minhash_band_pairs",
    "ngram_jaccard_pairs",
    "ann_topk",
    "knn_join",
    "bm25_topk",
    "bm25_search_many",
    "hybrid_search_indexed",
    "asof_purchase_attribution",
    "document_chunks",
    "lsh_ann_topk",
    "lsh_neardup_pairs",
    "ivf_search_all_probes",
    "ivf_search_many",
    "hnsw_index_topk",
    "decontamination_report",
    "semantic_contamination",
    "packed_sequences",
    "training_shards",
    "dsir_importance_weights",
    "vocab_top_terms",
    "domain_audit",
    "distinct_cardinality_kmv",
    "data_quality_report",
    "source_capped_sample",
    "summarize_labels",
    "rolling_fingerprints",
    "build_prompts_trim",
    "corpus_enrichment",
]


def main() -> None:
    from vector_search_ai_assistant_mongodbvcore_spark import get_spark
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    spark = get_spark(app_name="vsai-bench")
    registry = q.queries()
    # JVM/codegen warmup so the first measured query isn't billed for
    # session startup (it was ~+4s on the first groupBy otherwise)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Python/Arrow worker warmup: the ANN/kNN family runs pandas UDFs, and
    # the first UDF call pays daemon + Arrow serializer startup (~1s)
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm("id")).write.format("noop").mode("overwrite").save()
    # Index prewarm: materialized IVF/LSH indexes are built OFFLINE in any
    # real deployment (build once per corpus, serve many queries). A
    # regenerated dataset invalidates the cache fingerprint, and without
    # this the one-time rebuild lands inside the first timed index query
    # (+~18s observed at sf0.1) — the bench measures serving, not build.
    q.prewarm_indexes(spark, SF_DIR)
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    def _noop_run(name):
        registry[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    if _PASSES:
        # interleaved protocol (SPARK_GRAFT_BENCH_PASSES=N): warm every
        # query once, then N full passes over the whole list, one timed
        # execution per query per pass. Box-load swings on this shared
        # host last minutes — consecutive samples all land inside one
        # load regime, so their min still carries the spike; interleaving
        # time-decorrelates each query's samples across the run.
        for name in BENCH_QUERIES:
            _noop_run(name)
            samples[name] = []
        for _ in range(_PASSES):
            for name in BENCH_QUERIES:
                t0 = time.time()
                _noop_run(name)
                samples[name].append(round(time.time() - t0, 3))
        for name in BENCH_QUERIES:
            ts = sorted(samples[name])
            timings[name] = ts[len(ts) // 2]
            timings_min[name] = ts[0]
    else:
        for name in BENCH_QUERIES:
            # warm pass (untimed): pages the input files, JITs the codegen,
            # spins up any Python workers this query needs
            _noop_run(name)
            timings[name], samples[name] = _median_of(lambda: _noop_run(name))
            timings_min[name] = min(samples[name])
    total = round(sum(timings.values()), 3)
    total_min = round(sum(timings_min.values()), 3)
    sql_serves = _bench_sql_serves(spark, q)
    streaming = _bench_streaming(spark)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "vsai_spark_headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "value_min": total_min,
                "queries": timings,
                "queries_min": timings_min,
                "samples": samples,
                "sql_serves": sql_serves,
                "streaming": streaming,
                "protocol": _PROTOCOL,
                "sf": sf_val,
            }
        )
    )
    hist_serves = dict(sql_serves)
    if streaming.get("corpus_chain_rows_per_sec") is not None:
        hist_serves["stream_corpus_rows_per_s"] = streaming["corpus_chain_rows_per_sec"]
    _append_history(total, timings, sf_val, hist_serves, total_min)
    spark.stop()


# recorded on every JSON line + history row so a reader knows which
# timing discipline produced the numbers (r13 adjudicated an apparent
# regression that was pure inter-run load drift)
_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
_PROTOCOL = (
    f"warm1+interleaved{_PASSES}(median+min)"
    if _PASSES
    else "warm1+median3(+min3 since r14)"
)


def _median_of(run, n: int = 3) -> "tuple[float, list[float]]":
    """(median, samples) over n timed executions of run()."""
    ts = []
    for _ in range(n):
        t0 = time.time()
        run()
        ts.append(round(time.time() - t0, 3))
    return sorted(ts)[len(ts) // 2], ts


def _bench_sql_serves(spark, q) -> dict:
    """Median-of-3 timings for the raw-SQL-served vector paths: the
    quantized (int8) IVF whole-query serve with mandatory exact rerank,
    the LSH whole-query serve, and (r14) the HNSW segment-beam serve.
    Indexes build OFFLINE (cached under the engine's index tablespace,
    exactly like prewarm_indexes) so the rows measure serving, not
    build."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.hnsw import (
        PartitionedHnswIndex,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.ivf import IvfIndex
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import LshIndex
    from vector_search_ai_assistant_mongodbvcore_spark.plans.sql_rewrite import (
        VectorSqlSession,
    )

    tables = q._tables(spark, SF_DIR)
    emb = tables["embeddings"]
    IvfIndex(spark, q._cache_dir(SF_DIR, "ivf_q8_embeddings")).build_if_absent(
        emb, vector_col="embedding", num_lists=4, seed=42, fit_fraction=0.5,
        quantize=True,
    )
    LshIndex(spark, q._cache_dir(SF_DIR, "lsh_embeddings")).build_if_absent(
        emb, dims=len(q._QV_ANN), bits=q._LSH_ANN_BITS, tables=q._LSH_ANN_TABLES,
        vector_col="embedding", id_col="vec_id",
    )
    PartitionedHnswIndex(spark, q._cache_dir(SF_DIR, "hnsw_embeddings")).build_if_absent(
        emb, vector_col="embedding", id_col="vec_id", shards=8
    )
    emb.createOrReplaceTempView("embeddings")
    vec_lit = "array(" + ", ".join(f"{float(x)!r}D" for x in q._QV_ANN) + ")"
    sql = (
        f"SELECT vec_id, round(cosine_sim(embedding, {vec_lit}), 4) AS score "
        "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10"
    )

    out: dict[str, float] = {}
    for name, register, serve_marker in (
        (
            "ivf_quantized_sql_topk",
            lambda vs: vs.register_index(
                "embeddings",
                q._cache_dir(SF_DIR, "ivf_q8_embeddings"),
                n_probe=4,
                exact_source=emb,
            ),
            "PartitionFilters",
        ),
        (
            "lsh_sql_topk",
            lambda vs: vs.register_lsh_index(
                "embeddings", q._cache_dir(SF_DIR, "lsh_embeddings")
            ),
            "PartitionFilters",
        ),
        (
            # the HNSW serve has no partition filter — its plan marker is
            # the segment-local MapInPandas beam search
            "hnsw_sql_topk",
            lambda vs: vs.register_hnsw_index(
                "embeddings", q._cache_dir(SF_DIR, "hnsw_embeddings")
            ),
            "MapInPandas",
        ),
    ):
        vs = VectorSqlSession(spark)
        register(vs)
        # the row must time the SERVE, not a silent decline to the full
        # scan (r12 review finding: a registration/meta mismatch would
        # otherwise record full-scan numbers under the serve's label and
        # hide exactly the regression these rows exist to expose)
        from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import (
            plan_report,
        )

        served = vs.sql(sql)
        if serve_marker not in plan_report(served).raw:
            raise RuntimeError(
                f"{name}: the SQL serve declined to a full scan — fix the "
                "registration/index before recording a bench row"
            )
        served.write.format("noop").mode("overwrite").save()  # warm
        med, ts = _median_of(
            lambda: vs.sql(sql).write.format("noop").mode("overwrite").save()
        )
        out[name] = med
        out[f"{name}_samples"] = ts
    return out


def _bench_streaming(spark) -> dict:
    """One deterministic streaming-throughput row (r16, judge r15 #7:
    the streaming tier had no driver-visible perf signal): the flagship
    gate -> decontam -> dedup -> split -> chunk corpus chain
    (streaming/corpus.prepare_stream) driven with 3 generated 2000-row
    micro-batches (availableNow, memory sink, fresh checkpoint) — the
    same synthetic input tools/stream_probe.py uses, so the number is
    comparable with the committed probe history. ADD-ONLY key next to
    sql_serves; excluded from `value` to keep the headline total
    comparable with earlier rounds. Throughput is input rows / sum of
    per-micro-batch triggerExecution, i.e. the micro-batch machinery is
    measured, not the file generator."""
    import json as _json
    import shutil
    import tempfile

    batch, batches = 2000, 3
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()

    def _text(i: int, n: int = 80) -> str:
        return " ".join(
            words[(i * 7 + j * 3) % len(words)] + str((i + j) % 97) for j in range(n)
        )

    from vector_search_ai_assistant_mongodbvcore_spark.streaming.corpus import (
        prepare_stream,
    )

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(work, "docs")
        os.makedirs(src)
        base = time.time() - 3600
        rid = 0
        for bi in range(batches):
            path = os.path.join(src, f"docs_{bi:04d}.json")
            with open(path, "w") as f:
                for _ in range(batch):
                    f.write(_json.dumps({"doc_id": rid, "text": _text(rid)}) + "\n")
                    rid += 1
            os.utime(path, (base + bi, base + bi))
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = (
            prepare_stream(stream, benchmark_ngrams=["never matches anything at all"])
            .writeStream.format("memory")
            .queryName("bench_stream_corpus")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        progress = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = _json.loads(p.json)
            if p.get("numInputRows", 0) > 0:
                progress.append(p)
        trig_ms = [p["durationMs"]["triggerExecution"] for p in progress]
        total_s = sum(trig_ms) / 1000.0
        return {
            "corpus_chain_rows": rid,
            "corpus_chain_micro_batches": len(progress),
            "corpus_chain_rows_per_sec": round(rid / total_s, 1) if total_s else None,
            "corpus_chain_batch_latency_ms_mean": (
                round(sum(trig_ms) / len(trig_ms), 1) if trig_ms else None
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


_HISTORY_V2_HEADER = (
    "| when (UTC) | queries | total (s) | total_min (s) | protocol | "
    "top-5 slowest | sql serves (s) |\n"
)


def _append_history(total: float, timings: dict, sf, sql_serves=None,
                    total_min: "float | None" = None) -> None:
    """Append one row per bench run to BENCH_HISTORY.md (judge r9
    directive #9): the warmed protocol makes rounds comparable, so a
    regression is visible as a table diff instead of a JSON archaeology
    session. The per-query detail lands in a <details> block under the
    row. Only runs at the default sf (the driver's per-round bench);
    ad-hoc sf0.01 iteration loops don't pollute the trend."""
    import datetime

    if sf != 0.1:
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.md")
    new = not os.path.exists(path)
    needs_v2 = new
    if not new:
        with open(path) as f:
            needs_v2 = _HISTORY_V2_HEADER not in f.read()
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M")
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    with open(path, "a") as f:
        if new:
            f.write(
                "# BENCH_HISTORY — per-run totals at sf0.1 (warmed protocol, r9+)\n\n"
                "Appended by bench.py on every sf0.1 run; totals are the sum of\n"
                "timed passes after one untimed warm pass per query.\n"
            )
        if needs_v2:
            # r14 protocol revision: totals gain the load-robust
            # min-of-samples twin and an explicit protocol stamp —
            # compare total_min across runs, total within a round
            f.write(
                "\n## r14+ (protocol-stamped rows; total_min is the "
                "cross-run comparable)\n\n"
                + _HISTORY_V2_HEADER
                + "|---|---|---|---|---|---|---|\n"
            )
        top = ", ".join(f"{n} {t:.2f}" for n, t in slowest)
        serves = (
            ", ".join(
                f"{n} {t:.2f}"
                for n, t in sorted((sql_serves or {}).items())
                if isinstance(t, (int, float))  # skip the *_samples lists
            )
            or "—"
        )
        tmin = f"{total_min:.3f}" if total_min is not None else "—"
        f.write(
            f"| {stamp} | {len(timings)} | {total:.3f} | {tmin} | {_PROTOCOL} "
            f"| {top} | {serves} |\n"
        )


if __name__ == "__main__":
    main()
