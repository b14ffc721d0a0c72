"""The full corpus-prep chain on an unbounded document stream.

Completes the streaming tier: batch `prepare_training_corpus`
(operators/pipeline.py) produces trainer-ready chunk rows from a corpus
at rest; this module produces the SAME rows from a continuous ingest
stream. Stage-for-stage mapping:

  batch stage                  streaming form                     state
  exact_dedup (min-id keep)    dedup_stream (first-arrival keep)  keyed
  decontaminate (bcast join)   decontam_keep column screen        none
  quality gates                gate_stream (streaming/quality)    none
  scrub_pii                    same column expression             none
  assign_split                 same column expression             none
  chunk_documents              same narrow explode                none

Everything except dedup is a stateless projection/filter, so the chain
is append-mode-safe with exactly ONE stateful operator (the dedup state
store), and stages ahead of it shrink its input.

The decontamination screen replaces the batch broadcast-join + keyed
aggregation (not streamable in append mode — the per-doc hit count is
an aggregation over an exploded stream) with a PER-ROW set intersection
against the collected benchmark n-gram set: eval suites are MBs, so the
distinct n-gram list is driver-collected once (same boundedness argument
as the batch broadcast) and probed per row — a pure-JVM literal array
for small sets, a broadcast frozenset via Arrow UDF above
_LITERAL_PROBE_MAX (see decontam_keep). Semantics are
identical to contamination_report's verdict: distinct shared n-grams
>= min_hits => dropped; NULL/empty-shingle docs are kept (0 hits).

Ordering caveats vs batch (documented, pinned in tests):
  * batch exact dedup keeps the MIN id per fingerprint; the stream keeps
    the FIRST ARRIVAL. Equal when ingest order is id order (the common
    append-log case); otherwise the kept representative differs but the
    kept CONTENT set is identical.
  * the quality gate runs BEFORE the dedup state store on the stream
    (junk never enters state); both gates and the screen depend only on
    text, so filter-then-dedup equals dedup-then-filter up to that same
    representative choice.
  * PII scrubbing runs AFTER dedup (as in batch): the dedup key is the
    RAW text fingerprint, so docs differing only in scrubbed spans stay
    distinct, exactly as exact_dedup sees them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX
from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
    require_language_screen,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_watermarked,
)
from vector_search_ai_assistant_mongodbvcore_spark.streaming.quality import gate_stream

__all__ = [
    "collect_benchmark_ngrams",
    "decontam_keep",
    "decontam_mask",
    "prepare_stream",
    "start_shard_export_stream",
    "start_corpus_stream",
]


def collect_benchmark_ngrams(
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_ngrams: int = 2_000_000,
) -> list[str]:
    """Driver-collect the benchmark's distinct n-gram set (the stream-side
    analog of the batch broadcast). Raises if the set exceeds
    `max_ngrams` — the boundedness assumption is part of the contract,
    not a silent truncation."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
        benchmark_ngrams,
    )

    rows = benchmark_ngrams(bench, text_col, id_col, n).limit(max_ngrams + 1).collect()
    if len(rows) > max_ngrams:
        raise ValueError(
            f"benchmark n-gram set exceeds max_ngrams={max_ngrams}; "
            "decontaminate in batch instead"
        )
    return [r["ng"] for r in rows]


# above this many benchmark n-grams, the pure-JVM literal-array probe is
# replaced by a broadcast-set Arrow UDF: a literal array costs one py4j
# call per element at PLAN time and embeds an N-child Catalyst expression
# in every micro-batch plan — fine for a few thousand, pathological for a
# 500k-ngram eval suite (minutes of driver plan construction)
_LITERAL_PROBE_MAX = 4096

# broadcast handles cached by benchmark-set content digest: decontam_keep/
# decontam_mask are called once per PLAN construction, and a long-lived
# session that rebuilds plans repeatedly (re-invoking prepare_stream per
# run) must not accumulate one live broadcast per call. The cache is tiny
# (a handful of eval suites per session); evicted entries are unpersisted.
_BC_CACHE: "dict[str, object]" = {}
_BC_CACHE_MAX = 4


def _bench_broadcast(spark, bench_ngrams: list[str]):
    import hashlib as _hl

    h = _hl.md5()
    for g in bench_ngrams:
        h.update(g.encode("utf-8"))
        h.update(b"\x00")
    # keyed by CONTEXT + content: a broadcast handle is only valid inside
    # the SparkContext that created it — after spark.stop() + a new
    # session in the same process, a content-only hit would hand tasks a
    # dead broadcast id
    app = spark.sparkContext.applicationId
    digest = f"{app}:{h.hexdigest()}:{len(bench_ngrams)}"
    bc = _BC_CACHE.get(digest)
    if bc is None:
        bc = spark.sparkContext.broadcast(frozenset(bench_ngrams))
        _BC_CACHE[digest] = bc
        while len(_BC_CACHE) > _BC_CACHE_MAX:
            old_key = next(iter(_BC_CACHE))
            old = _BC_CACHE.pop(old_key)
            try:
                old.unpersist()
            except Exception:
                pass  # a dead SparkContext: nothing left to free
    return bc



def _quality_trio(
    use_gopher_rules: bool,
    min_quality: "float | None",
    max_repeated_word_frac: "float | None",
    max_dup_line_frac: "float | None",
) -> dict:
    """gate_stream kwargs for the batch-parity quality rule
    (pipeline.py's if/else): the Gopher battery REPLACES the heuristic
    trio — floor/ceilings apply only when the rules are off, and then
    with the batch defaults (0.3/0.5/0.5 in the callers' signatures).
    A caller who EXPLICITLY tightens the trio while leaving the Gopher
    battery on would silently get a laxer gate than requested — warn
    instead of dropping the values without a trace (matching batch
    semantics is still the behavior; the warning is the honesty)."""
    if use_gopher_rules:
        non_default = [
            name
            for name, val, default in (
                ("min_quality", min_quality, 0.3),
                ("max_repeated_word_frac", max_repeated_word_frac, 0.5),
                ("max_dup_line_frac", max_dup_line_frac, 0.5),
            )
            if val != default
        ]
        if non_default:
            import warnings

            warnings.warn(
                f"use_gopher_rules=True replaces the heuristic quality trio; "
                f"ignoring non-default {', '.join(non_default)} (set "
                f"use_gopher_rules=False to apply them)",
                stacklevel=3,
            )
        return {}
    return {
        "min_quality": min_quality,
        "max_repeated_word_frac": max_repeated_word_frac,
        "max_dup_line_frac": max_dup_line_frac,
    }


def decontam_keep(
    bench_ngrams: list[str],
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> Column:
    """Keep predicate: the doc shares fewer than `min_hits` distinct word
    n-grams with the benchmark set. Stateless (append-mode-safe on a
    stream); NULL text has no shingles and is kept, matching
    contamination_report's 0-hit verdict.

    Small sets (<= _LITERAL_PROBE_MAX) probe a literal array with
    arrays_overlap/array_intersect — pure JVM, zero Python. Larger sets
    switch to a Spark-broadcast frozenset probed by an Arrow-batched UDF
    over the SAME JVM-computed shingle array (shingle semantics never
    leave the JVM; only the set membership is Python) — identical
    verdicts, pinned by a forced-path parity test."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    doc_ngs = F.array_distinct(TX.shingles(c, n))
    if not bench_ngrams:
        return F.lit(True)
    if len(bench_ngrams) <= _LITERAL_PROBE_MAX:
        bench_lit = F.array(*[F.lit(g) for g in bench_ngrams])
        if min_hits == 1:
            hit = F.arrays_overlap(doc_ngs, bench_lit)
            return F.coalesce(~hit, F.lit(True))
        hits = F.size(F.array_intersect(doc_ngs, bench_lit))
        return F.coalesce(hits < F.lit(min_hits), F.lit(True))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as _F
    from pyspark.sql import types as T

    spark = SparkSession.getActiveSession()
    bc = _bench_broadcast(spark, bench_ngrams)

    @_F.pandas_udf(T.IntegerType())
    def shared(ngs):
        bench = bc.value
        return ngs.map(
            lambda a: 0 if a is None else sum(1 for g in a if g in bench)
        )

    return F.coalesce(shared(doc_ngs) < F.lit(min_hits), F.lit(True))


def decontam_mask(
    bench_ngrams: list[str],
    text_col: str = "text",
    n: int = 8,
    preserve_unmasked: bool = True,
) -> Column:
    """Masked-text column: the streaming form of surgical decontamination
    (operators/decontam.remove_contaminated_spans) — every word covered by
    a benchmark-overlapping n-gram is blanked, the rest of the document
    survives. Stateless (append-mode-safe); NULL text stays NULL.

    `preserve_unmasked` (default): documents with ZERO hits pass through
    BYTE-IDENTICAL — masking must not rewrite what it did not touch
    (newlines carry the line-based Gopher signals; a corpus-wide
    whitespace normalization would blind duplicate_line_fraction and
    friends). Only actually-masked docs get the whitespace-normalized
    word rejoin (that rejoin is inherent to word-granular span removal
    and is batch clean_text exactly). preserve_unmasked=False emits the
    normalized rejoin for every doc — the batch operator's clean_text
    contract, used by the operator-parity tests.

    Positional parity with the batch operator: TX.shingles puts the
    shingle starting at word i at array index i (short docs get ONE
    whole-text shingle at index 0, covering the whole doc when it hits).
    Small benchmark sets probe a literal array — pure JVM; above
    _LITERAL_PROBE_MAX the whole mask runs in ONE Arrow-batched UDF over
    the JVM-computed word + shingle arrays (a UDF output cannot feed a
    higher-order-function lambda, so the blanking moves into the same
    batch as the set probe), the same size split decontam_keep uses."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    w = TX.words(c)
    if not bench_ngrams:
        if preserve_unmasked:
            return c
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            F.array_join(w, " ")
        )
    ngs = TX.shingles(c, n)
    if len(bench_ngrams) <= _LITERAL_PROBE_MAX:
        bench_lit = F.array(*[F.lit(g) for g in bench_ngrams])
        cov = F.array_distinct(
            F.flatten(
                F.filter(
                    F.transform(
                        ngs,
                        lambda g, i: F.when(
                            F.array_contains(bench_lit, g),
                            F.sequence(i, i + F.lit(n) - 1),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                )
            )
        )
        kept = F.filter(
            F.transform(w, lambda wd, i: F.when(~F.array_contains(cov, i), wd)),
            lambda x: x.isNotNull(),
        )
        rebuilt = F.array_join(kept, " ")
        out = (
            F.when(F.size(cov) == 0, c).otherwise(rebuilt)
            if preserve_unmasked
            else rebuilt
        )
        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)
    else:
        import pandas as pd
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as _F
        from pyspark.sql import types as T

        spark = SparkSession.getActiveSession()
        bc = _bench_broadcast(spark, bench_ngrams)

        keep_orig = preserve_unmasked

        @_F.pandas_udf(T.StringType())
        def masked(texts, word_arrays, ng_arrays):
            bench = bc.value

            def one(t, wa, a):
                if wa is None:
                    return None
                cov: set[int] = set()
                if a is not None:
                    for i, g in enumerate(a):
                        if g in bench:
                            cov.update(range(i, i + n))
                if not cov and keep_orig:
                    return t  # untouched doc: byte-identical passthrough
                return " ".join(x for i, x in enumerate(wa) if i not in cov)

            return pd.Series(
                [one(t, wa, a) for t, wa, a in zip(texts, word_arrays, ng_arrays)]
            )

        return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
            masked(c, w, ngs)
        )


def prepare_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_gopher_rules: bool = True,
    min_quality: "float | None" = 0.3,
    max_repeated_word_frac: "float | None" = 0.5,
    max_dup_line_frac: "float | None" = 0.5,
    quality_model: dict | None = None,
    min_classifier_prob: float = 0.5,
    blocklist: "list[str] | None" = None,
    blocklist_max_hits: int = 0,
    benchmark_ngrams: list[str] | None = None,
    decontam_n: int = 8,
    decontam_min_hits: int = 1,
    decontam_mode: str = "drop",
    splits: dict[str, float] | None = None,
    seed: int = 42,
    scrub: bool = True,
    dedupe_doc_lines: bool = False,
    chunk_size: int = 32,
    chunk_overlap: int = 8,
    watermark_col: str | None = None,
    watermark_delay: str = "30 minutes",
    keep_languages: "tuple[str, ...] | None" = None,
    lang_col: "str | None" = None,
    lang_model: "dict | None" = None,
    min_lang_confidence: "float | None" = None,
) -> DataFrame:
    """Trainer-ready (id, split, chunk_id, n_tokens, chunk_text) rows from
    a streaming (or batch — the plan is mode-agnostic) document frame.

    Pass `benchmark_ngrams` from collect_benchmark_ngrams() to enable the
    decontamination screen. `watermark_col` switches the dedup state store
    to the watermark-bounded form (dedup_stream_watermarked) for infinite
    streams; without it, state is one fingerprint per distinct doc."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.chunking import (
        chunk_documents,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        assign_split,
    )

    require_language_screen(min_lang_confidence, keep_languages)
    if dedupe_doc_lines:
        # batch parity: per-doc line cleaning FIRST (prepare_training_corpus
        # applies it before exact dedup, so the dedup key is the cleaned
        # text on both paths) — a stateless column rewrite
        docs = docs.withColumn(text_col, TX.dedupe_lines(F.col(text_col)))
    mask = decontam_mode == "mask" and benchmark_ngrams is not None
    if decontam_mode not in ("drop", "mask"):
        raise ValueError(
            f"decontam_mode must be 'drop' or 'mask', got {decontam_mode!r}"
        )
    work = docs
    gate_col = text_col
    if mask:
        # surgical mode, batch-equivalent ordering without a second pass:
        # the masked text rides as a derived COLUMN, the quality gates
        # judge the MASKED text (as batch does — decontam precedes the
        # gates there), while the dedup state key stays the RAW text
        # (batch exact-dedups before masking). Predicates don't change
        # keys, so one chain serves both orders.
        work = docs.withColumn(
            "_masked", decontam_mask(benchmark_ngrams, text_col, decontam_n)
        )
        gate_col = "_masked"
    trio = _quality_trio(
        use_gopher_rules, min_quality, max_repeated_word_frac, max_dup_line_frac
    )
    gated = gate_stream(
        work,
        text_col=gate_col,
        id_col=id_col,
        use_gopher_rules=use_gopher_rules,
        quality_model=quality_model,
        min_classifier_prob=min_classifier_prob,
        blocklist=blocklist,
        blocklist_max_hits=blocklist_max_hits,
        scrub=False,  # scrub AFTER dedup: the dedup key is the raw text
        **trio,
    )
    if benchmark_ngrams is not None and not mask:
        gated = gated.filter(
            decontam_keep(benchmark_ngrams, text_col, decontam_n, decontam_min_hits)
        )
    if keep_languages is not None:
        # batch parity: the language screen judges the same text the
        # quality gates judged (masked in mask mode, as in batch where
        # decontam precedes the screen); stateless predicate — position
        # relative to the exact-dedup state store is immaterial because
        # every member of an exact-dup class shares the text
        from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
            language_expr,
        )

        gated = gated.filter(
            language_expr(
                gate_col, lang_col, lang_model, min_lang_confidence
            ).isin(*keep_languages)
        )
    if watermark_col is not None:
        deduped = dedup_stream_watermarked(
            gated, watermark_col, watermark_delay, text_col=text_col
        )
    else:
        deduped = dedup_stream(gated, text_col=text_col)
    if mask:
        deduped = deduped.withColumn(text_col, F.col("_masked")).drop("_masked")
    if scrub:
        deduped = deduped.withColumn(text_col, TX.scrub_pii(F.col(text_col)))
    labeled = assign_split(deduped, id_col=id_col, splits=splits, seed=seed)
    chunks = chunk_documents(
        labeled.select(id_col, text_col, "split"),
        size=chunk_size,
        overlap=chunk_overlap,
        text_col=text_col,
        id_col=id_col,
        carry_cols=("split",),
    )
    return chunks.select(id_col, "split", "chunk_id", "n_tokens", "chunk_text")


def start_shard_export_stream(
    chunks: DataFrame,
    out_dir: str,
    seq_len: int,
    checkpoint_dir: str,
    tokenizer=None,
    max_rows_per_shard: int = 100_000,
):
    """Terminal stage of the streaming pipeline: prepare_stream's chunk
    rows -> trainer-ready token-sequence SHARDS, continuously.

    Each micro-batch is tokenized ONCE (the token frame is persisted so
    packing's several plan branches re-read the cache, not the tokenizer
    — the staging-barrier discipline materialize_sequences documents),
    packed with the batch operator, and written to
    out_dir/split=<s>/batch=<id>/. Sequence boundaries never span
    micro-batches, so the per-(split, batch) tail sequence may be short
    (the documented stream-vs-batch packing difference; everything else
    is the batch operator verbatim). The sequence KEY is
    (split, batch, seq_id) — seq_id restarts per split inside each batch
    exactly as the batch exporter's key is (split, epoch, seq_id); the
    batch-id offset keeps seq_id unique WITHIN a split across the whole
    stream.

    Exactly-once under retries: the write is dynamic-partition-OVERWRITE
    keyed on the deterministic micro-batch id — a replayed batch
    replaces exactly its own (split, batch) partitions instead of
    appending duplicates. Dynamic mode is set as a WRITER option, never
    by toggling the session conf (which would race with any concurrent
    writer on the same SparkSession and, losing the race, static-mode
    truncate the whole tree).
    """

    def _batch(df: DataFrame, epoch_id: int) -> None:
        _write_shard_batch(df, epoch_id, out_dir, seq_len, tokenizer, max_rows_per_shard)

    return (
        chunks.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _write_shard_batch(
    df: DataFrame,
    epoch_id: int,
    out_dir: str,
    seq_len: int,
    tokenizer,
    max_rows_per_shard: int,
) -> None:
    """One micro-batch of chunk rows -> packed token-sequence shards at
    out_dir/split=<s>/batch=<id>/ — the foreachBatch body of
    start_shard_export_stream, shared by start_corpus_stream."""
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        tokenize,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.export import (
        materialize_sequences,
    )

    tok = tokenizer if tokenizer is not None else tokenize
    toks = (
        df.select(
            "split", "doc_id", "chunk_id", tok(F.col("chunk_text")).alias("_toks")
        )
        .withColumn("n_tokens", F.size("_toks"))
        .persist()
    )
    try:
        if toks.count() == 0:
            return
        seqs = materialize_sequences(toks, seq_len, pretokenized=True)
        seqs = seqs.withColumn(
            "seq_id", F.col("seq_id") + F.lit(int(epoch_id) << 33)
        ).withColumn("batch", F.lit(int(epoch_id)))
        (
            seqs.write.mode("overwrite")
            .partitionBy("split", "batch")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", max_rows_per_shard)
            .parquet(out_dir)
        )
    finally:
        toks.unpersist()


def start_language_export_stream(
    docs: DataFrame,
    lang_model: dict,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    min_confidence: "float | None" = None,
    languages: "tuple[str, ...] | None" = None,
    lang_col_name: str = "lang_pred",
    files_per_lang: int = 8,
    salt_col: "str | None" = None,
):
    """Streaming twin of operators.export.export_language_partitioned:
    route a streaming document frame into the CCNet-shaped per-language
    partitioned tree, continuously —

        <out_dir>/<lang_col_name>=en/export_batch=<n>/part-*.parquet
        <out_dir>/<lang_col_name>=unknown/...     (quarantine, always kept)

    The routing (predict -> below-floor 'unknown' quarantine ->
    `languages` restriction that always keeps 'unknown' -> salted
    (lang, pmod(hash(salt_col), files_per_lang)) repartition so a
    dominant language is written by files_per_lang tasks per batch, not
    one straggler) is operators.export.language_routed — the SAME code
    the batch exporter runs, so stream==batch routing parity holds by
    construction and only the write discipline differs here.

    Exactly-once under micro-batch retries: each batch lands under its
    deterministic `export_batch=<epoch_id>` sub-partition via dynamic
    partition overwrite — a replayed batch replaces exactly its own
    (lang, batch) partitions instead of appending duplicates (the same
    discipline as start_shard_export_stream; dynamic mode is a WRITER
    option, never a session-conf toggle). Readers use
    read_language_partition, which prunes on the language partition and
    drops the export_batch bookkeeping column, so downstream pipelines
    see the identical document schema from either exporter's tree."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.export import (
        language_routed,
    )

    # fail fast at START time, not first-batch time
    if files_per_lang < 1:
        raise ValueError(f"files_per_lang must be >= 1, got {files_per_lang}")
    for col in (lang_col_name, "export_batch"):
        if col in docs.columns:
            # withColumn would silently OVERWRITE the caller's data
            # column (the routing prediction / the replay key) in the
            # exported tree (r12 review: loud beats lossy). export_batch
            # is this writer's hardcoded bookkeeping partition;
            # lang_col_name at least is renamable.
            raise ValueError(
                f"column {col!r} already exists on the input stream — "
                + (
                    "rename it or pass a different lang_col_name"
                    if col == lang_col_name
                    else "rename it (export_batch is the streaming "
                    "exporter's reserved replay-key partition)"
                )
            )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        routed = language_routed(
            df,
            lang_model,
            text_col=text_col,
            min_confidence=min_confidence,
            languages=languages,
            lang_col_name=lang_col_name,
            files_per_lang=files_per_lang,
            salt_col=salt_col,
        ).withColumn("export_batch", F.lit(int(epoch_id)))
        (
            routed.write.mode("overwrite")
            .partitionBy(lang_col_name, "export_batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _post_dedup_stages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    use_gopher_rules: bool,
    min_quality: "float | None",
    max_repeated_word_frac: "float | None",
    max_dup_line_frac: "float | None",
    quality_model: "dict | None",
    min_classifier_prob: float,
    blocklist: "list[str] | None",
    blocklist_max_hits: int,
    benchmark_ngrams: "list[str] | None",
    decontam_n: int,
    decontam_min_hits: int,
    decontam_mode: str,
    splits: "dict[str, float] | None",
    seed: int,
    scrub: bool,
    chunk_size: int,
    chunk_overlap: int,
    keep_languages: "tuple[str, ...] | None" = None,
    lang_col: "str | None" = None,
    lang_model: "dict | None" = None,
    min_lang_confidence: "float | None" = None,
) -> DataFrame:
    """The stateless tail of the corpus chain in BATCH order
    (prepare_training_corpus: decontam -> quality gates -> scrub ->
    split -> chunk), applied to an already fully-deduplicated document
    frame. Used by start_corpus_stream's foreachBatch, where exact AND
    fuzzy dedup have both happened upstream — unlike prepare_stream,
    which gates BEFORE its in-plan dedup state store and must therefore
    carry the masked text as a derived column."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.chunking import (
        chunk_documents,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
        assign_split,
    )

    require_language_screen(min_lang_confidence, keep_languages)
    work = df
    if benchmark_ngrams is not None:
        if decontam_mode == "mask":
            work = work.withColumn(
                text_col, decontam_mask(benchmark_ngrams, text_col, decontam_n)
            )
        elif decontam_mode == "drop":
            work = work.filter(
                decontam_keep(benchmark_ngrams, text_col, decontam_n, decontam_min_hits)
            )
        else:
            raise ValueError(
                f"decontam_mode must be 'drop' or 'mask', got {decontam_mode!r}"
            )
    trio = _quality_trio(
        use_gopher_rules, min_quality, max_repeated_word_frac, max_dup_line_frac
    )
    work = gate_stream(
        work,
        text_col=text_col,
        id_col=id_col,
        use_gopher_rules=use_gopher_rules,
        quality_model=quality_model,
        min_classifier_prob=min_classifier_prob,
        blocklist=blocklist,
        blocklist_max_hits=blocklist_max_hits,
        scrub=False,
        **trio,
    )
    if keep_languages is not None:
        # batch order: the language screen follows the quality gates and
        # judges the post-decontam text (mask mode already rewrote
        # text_col above); stateless predicate, same expression as
        # prepare_training_corpus via the shared language_expr
        from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
            language_expr,
        )

        work = work.filter(
            language_expr(
                text_col, lang_col, lang_model, min_lang_confidence
            ).isin(*keep_languages)
        )
    if scrub:
        work = work.withColumn(text_col, TX.scrub_pii(F.col(text_col)))
    labeled = assign_split(work, id_col=id_col, splits=splits, seed=seed)
    chunks = chunk_documents(
        labeled.select(id_col, text_col, "split"),
        size=chunk_size,
        overlap=chunk_overlap,
        text_col=text_col,
        id_col=id_col,
        carry_cols=("split",),
    )
    return chunks.select(id_col, "split", "chunk_id", "n_tokens", "chunk_text")


def start_corpus_stream(
    docs: DataFrame,
    out_dir: str,
    seq_len: int,
    checkpoint_dir: str,
    neardup: "dict | None" = None,
    tokenizer=None,
    max_rows_per_shard: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_gopher_rules: bool = True,
    min_quality: "float | None" = 0.3,
    max_repeated_word_frac: "float | None" = 0.5,
    max_dup_line_frac: "float | None" = 0.5,
    quality_model: "dict | None" = None,
    min_classifier_prob: float = 0.5,
    blocklist: "list[str] | None" = None,
    blocklist_max_hits: int = 0,
    benchmark_ngrams: "list[str] | None" = None,
    decontam_n: int = 8,
    decontam_min_hits: int = 1,
    decontam_mode: str = "drop",
    splits: "dict[str, float] | None" = None,
    seed: int = 42,
    scrub: bool = True,
    dedupe_doc_lines: bool = False,
    chunk_size: int = 32,
    chunk_overlap: int = 8,
    watermark_col: "str | None" = None,
    watermark_delay: str = "30 minutes",
    keep_languages: "tuple[str, ...] | None" = None,
    lang_col: "str | None" = None,
    lang_model: "dict | None" = None,
    min_lang_confidence: "float | None" = None,
):
    """The WHOLE corpus pipeline as one streaming query: raw document
    stream -> trainer-ready shards, now including FUZZY (MinHash) near-
    dedup so the stream produces the same rows as the one-command batch
    path, which defaults fuzzy dedup ON (tools/prepare_run.py).

    `neardup=None` is exactly prepare_stream -> start_shard_export_stream
    (exact dedup only). `neardup={...}` composes the streaming MinHash
    near-dedup (streaming/neardup.py) into the SAME foreachBatch as the
    decontam/gate/scrub/split/chunk/shard stages. Accepted keys:
    store_path (required), num_hashes=16, bands=4, shingle_size=5,
    store_buckets=16, max_bucket=10_000.

    Stage placement mirrors the batch operator exactly
    (prepare_training_corpus with neardup_minhash=True,
    neardup_keep="greedy"): line-dedup -> EXACT dedup -> FUZZY dedup ->
    decontam -> quality gates -> scrub -> split -> chunk. With fuzzy
    dedup on, the quality gates move INTO the sink (after fuzzy) rather
    than ahead of the exact-dedup state store: fuzzy verdicts depend on
    WHICH other docs are present — a junk doc's band keys must poison
    later near-dups exactly as they do in batch, so junk may only be
    gated out AFTER its keys enter the store. The exact-dedup state
    therefore holds junk too (documented state-size trade vs
    prepare_stream's gate-first order, which is only safe because exact
    duplicates have identical text and identical gate verdicts).

    Exactly-once: the band-key store probe excludes rows stamped with
    the current (run, batch) attempt and the shard write is dynamic-
    partition overwrite on the batch id, so a replayed micro-batch
    reproduces both its survivor set and its shard partitions
    byte-identical. The combined state surviving a restart =
    Spark's dedup state store (via the checkpoint) + the band-key store
    (via its own versioned table) — pinned in tests."""
    # FAIL FAST at call time on both paths: the neardup path validates
    # inside _post_dedup_stages, which only runs in foreachBatch AFTER
    # the query starts — surfacing the misuse as an async
    # StreamingQueryException instead of here (review finding)
    require_language_screen(min_lang_confidence, keep_languages)
    if neardup is None:
        chunks = prepare_stream(
            docs,
            text_col=text_col,
            id_col=id_col,
            use_gopher_rules=use_gopher_rules,
            min_quality=min_quality,
            max_repeated_word_frac=max_repeated_word_frac,
            max_dup_line_frac=max_dup_line_frac,
            quality_model=quality_model,
            min_classifier_prob=min_classifier_prob,
            blocklist=blocklist,
            blocklist_max_hits=blocklist_max_hits,
            benchmark_ngrams=benchmark_ngrams,
            decontam_n=decontam_n,
            decontam_min_hits=decontam_min_hits,
            decontam_mode=decontam_mode,
            splits=splits,
            seed=seed,
            scrub=scrub,
            dedupe_doc_lines=dedupe_doc_lines,
            chunk_size=chunk_size,
            chunk_overlap=chunk_overlap,
            watermark_col=watermark_col,
            watermark_delay=watermark_delay,
            keep_languages=keep_languages,
            min_lang_confidence=min_lang_confidence,
            lang_col=lang_col,
            lang_model=lang_model,
        )
        return start_shard_export_stream(
            chunks, out_dir, seq_len, checkpoint_dir, tokenizer, max_rows_per_shard
        )

    from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
        neardup_filter_batch,
        open_neardup_store,
        run_id_for_checkpoint,
        seq_base_for_checkpoint,
    )

    nd = dict(neardup)
    store_path = nd.pop("store_path")
    nd_params = {
        "num_hashes": nd.pop("num_hashes", 16),
        "bands": nd.pop("bands", 4),
        "shingle_size": nd.pop("shingle_size", 5),
        "max_bucket": nd.pop("max_bucket", 10_000),
    }
    store_buckets = nd.pop("store_buckets", 16)
    # watermark-style scoped fuzzy dedup for infinite streams: evict
    # store stamps older than this many batches (see
    # neardup.evict_neardup_history) — pair with watermark_col, which
    # bounds the exact-dedup state the same way
    max_history = nd.pop("max_history_batches", None)
    if nd:
        raise ValueError(f"unknown neardup keys: {sorted(nd)}")

    spark = docs.sparkSession
    run_id = run_id_for_checkpoint(checkpoint_dir)
    seq_base = (
        seq_base_for_checkpoint(
            checkpoint_dir,
            open_neardup_store(spark, store_path, n_buckets=store_buckets),
        )
        if max_history is not None
        else 0
    )

    pre = docs
    if dedupe_doc_lines:
        # batch parity: per-doc line cleaning FIRST, so both dedup keys
        # (exact fingerprint AND minhash shingles) see the cleaned text
        pre = pre.withColumn(text_col, TX.dedupe_lines(F.col(text_col)))
    if watermark_col is not None:
        deduped = dedup_stream_watermarked(
            pre, watermark_col, watermark_delay, text_col=text_col
        )
    else:
        deduped = dedup_stream(pre, text_col=text_col)

    def _batch(df: DataFrame, epoch_id: int) -> None:
        store = open_neardup_store(spark, store_path, n_buckets=store_buckets)
        cur_seq = seq_base + int(epoch_id)
        kept = neardup_filter_batch(
            df, store, int(epoch_id), text_col, id_col,
            run_id=run_id, seq=cur_seq, **nd_params,
        )
        chunks = _post_dedup_stages(
            kept,
            text_col=text_col,
            id_col=id_col,
            use_gopher_rules=use_gopher_rules,
            min_quality=min_quality,
            max_repeated_word_frac=max_repeated_word_frac,
            max_dup_line_frac=max_dup_line_frac,
            quality_model=quality_model,
            min_classifier_prob=min_classifier_prob,
            blocklist=blocklist,
            blocklist_max_hits=blocklist_max_hits,
            benchmark_ngrams=benchmark_ngrams,
            decontam_n=decontam_n,
            decontam_min_hits=decontam_min_hits,
            decontam_mode=decontam_mode,
            splits=splits,
            seed=seed,
            scrub=scrub,
            chunk_size=chunk_size,
            chunk_overlap=chunk_overlap,
            keep_languages=keep_languages,
            min_lang_confidence=min_lang_confidence,
            lang_col=lang_col,
            lang_model=lang_model,
        )
        _write_shard_batch(
            chunks, epoch_id, out_dir, seq_len, tokenizer, max_rows_per_shard
        )
        # history eviction LAST: a mid-batch failure replays against the
        # still-unevicted store, keeping the divergence window at the
        # horizon as small as the caveat on evict_neardup_history assumes
        if max_history is not None and cur_seq >= max_history:
            from vector_search_ai_assistant_mongodbvcore_spark.streaming.neardup import (
                evict_neardup_history,
            )

            evict_neardup_history(store, cur_seq - max_history + 1)

    return (
        deduped.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
