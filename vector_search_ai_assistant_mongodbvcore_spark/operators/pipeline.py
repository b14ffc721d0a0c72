"""End-to-end training-corpus preparation: the operators composed the way
a 100 TB pipeline actually runs them.

    raw docs
      -> line dedup           (functions/text.dedupe_lines per-doc pass,
                               optional: dedupe_doc_lines=True, CCNet
                               order — cleaning before corpus dedup)
      -> exact dedup          (operators/dedup.exact_dedup keep-set)
      -> fuzzy dedup          (operators/dedup.minhash_lsh_pairs +
                               component/greedy/best-quality keep policy,
                               optional: neardup_minhash=True)
      -> decontamination      (operators/decontam, optional: drop docs
                               sharing n-grams with a benchmark set, or
                               surgically MASK only the overlapping
                               spans via decontam_mode="mask")
      -> quality filters      (functions/text: quality_score floor,
                               repetition ceilings — the Gopher/C4 pass;
                               optional C4-style blocklist screen)
      -> classifier floor     (operators/quality_classifier, optional:
                               P(high quality) >= threshold)
      -> perplexity ceiling   (operators/lm_quality, optional: CCNet-style
                               reference-LM surprise cap)
      -> language screen      (functions/text.language_id or a metadata
                               column, optional: keep_languages)
      -> DSIR selection       (operators/dsir, optional: Gumbel-top-k
                               importance resample toward a target domain)
      -> PII scrub            (functions/text.scrub_pii)
      -> mixture sampling     (operators/splits.sample_by_rates, optional)
      -> per-source cap       (operators/splits.cap_per_group, optional:
                               no domain exceeds max_docs_per_source)
      -> split assignment     (operators/splits.assign_split)
      -> chunking             (operators/chunking.chunk_documents)

Every stage is one of the individually-tested operators; this module only
composes them, adds no new semantics, and keeps the whole flow lazy (one
DataFrame in, one DataFrame out — callers write it wherever the corpus
lives). Stage order is load-bearing: dedup before quality (a duplicate
passing quality once must not pass twice); decontamination before the
quality stages (contaminated docs must not influence what survives, and
the benchmark screen is cheapest on the deduped corpus); scrub before
chunking (chunk boundaries must not split a redaction placeholder);
splits before chunking (all chunks of a doc belong to one split — no
train/test leakage through shared text).

Sequence packing (operators/packing.py) deliberately stays OUT of this
composition: packing consumes the TOKENIZED chunk stream and its layout
depends on the trainer's context length — run pack_sequences over this
function's output joined to its token counts as a separate stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX
from vector_search_ai_assistant_mongodbvcore_spark.operators.chunking import chunk_documents
from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import exact_dedup
from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import (
    assign_split,
    sample_by_rates,
)


def prepare_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    max_repeated_word_frac: float = 0.5,
    max_dup_line_frac: float = 0.5,
    source_rates: dict[str, float] | None = None,
    source_col: str = "source",
    splits: dict[str, float] | None = None,
    chunk_size: int = 32,
    chunk_overlap: int = 8,
    seed: int = 42,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_min_hits: int = 1,
    decontam_mode: str = "drop",
    quality_model: dict | None = None,
    min_classifier_prob: float = 0.5,
    blocklist: "list[str] | None" = None,
    blocklist_max_hits: int = 0,
    lm_model=None,
    max_perplexity: float | None = None,
    use_gopher_rules: bool = False,
    keep_languages: "tuple[str, ...] | None" = None,
    lang_col: str | None = None,
    lang_model: dict | None = None,
    min_lang_confidence: "float | None" = None,
    dsir_target: DataFrame | None = None,
    dsir_top_k: int | None = None,
    dsir_temperature: float = 1.0,
    dsir_num_buckets: int = 10_000,
    max_docs_per_source: int | None = None,
    neardup_minhash: bool = False,
    neardup_num_hashes: int = 16,
    neardup_bands: int = 4,
    neardup_shingle_size: int = 5,
    neardup_keep: str = "component",
    neardup_checkpoint_dir: "str | None" = None,
    dedupe_doc_lines: bool = False,
) -> DataFrame:
    """(id, split, chunk_id, n_tokens, chunk_text) ready for tokenization.

    Deterministic end to end: hash-based dedup keep-set, hash-based
    sampling/splits, expression-only filters — re-running over the same
    corpus yields the identical chunk set.

    `benchmark` (optional) enables the decontamination stage: docs sharing
    >= decontam_min_hits word decontam_n-grams with any benchmark doc are
    dropped. `quality_model` (optional, from
    quality_classifier.fit_quality_classifier) adds the learned-classifier
    floor on top of the heuristic quality gates — both are map-side
    (broadcast n-gram set / inlined literal weights)."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
        require_language_screen,
    )

    require_language_screen(min_lang_confidence, keep_languages)
    if dedupe_doc_lines:
        # CCNet order: per-doc line cleaning BEFORE corpus dedup, so two
        # docs differing only in repeated boilerplate collapse to one
        docs = docs.withColumn(text_col, TX.dedupe_lines(F.col(text_col)))

    keep = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    deduped = docs.join(keep, id_col, "left_semi")

    if neardup_minhash:
        # fuzzy dedup on the exact-deduped pool (cheaper: exact removed
        # the identical copies already). LSH candidates are accepted
        # unverified at the configured band agreement — the
        # MinHash-dedup trade documented at minhash_lsh_pairs; callers
        # needing exact-Jaccard verification run ngram_jaccard_pairs +
        # drop_component_duplicates outside the one-command path.
        # neardup_keep picks the survivor per duplicate cluster:
        #   "component"    — one doc per connected component, min id
        #   "greedy"       — drop any doc pairing with a lower id
        #                    (one-pass, can over-remove on chains)
        #   "best_quality" — RefinedWeb-style: the highest
        #                    heuristic-quality member survives
        from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
            drop_component_duplicates,
            drop_near_duplicates,
            minhash_lsh_pairs,
        )

        nd_pairs = minhash_lsh_pairs(
            deduped, text_col=text_col, id_col=id_col,
            num_hashes=neardup_num_hashes, bands=neardup_bands,
            shingle_size=neardup_shingle_size,
        )
        if neardup_keep == "greedy":
            deduped = drop_near_duplicates(deduped, nd_pairs, id_col=id_col)
        elif neardup_keep == "best_quality":
            scored = deduped.withColumn("_ndq", TX.quality_score(F.col(text_col)))
            deduped = drop_component_duplicates(
                scored, nd_pairs, id_col=id_col, quality_col="_ndq",
                checkpoint_dir=neardup_checkpoint_dir,
            ).drop("_ndq")
        elif neardup_keep == "component":
            deduped = drop_component_duplicates(
                deduped, nd_pairs, id_col=id_col,
                checkpoint_dir=neardup_checkpoint_dir,
            )
        else:
            raise ValueError(
                f"neardup_keep must be 'component', 'greedy' or 'best_quality', got {neardup_keep!r}"
            )

    if benchmark is not None:
        if decontam_mode == "drop":
            from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
                decontaminate,
            )

            deduped = decontaminate(
                deduped,
                benchmark,
                n=decontam_n,
                min_hits=decontam_min_hits,
                text_col=text_col,
                id_col=id_col,
            )
        elif decontam_mode == "mask":
            # surgical decontamination: blank ONLY the words covered by a
            # benchmark-overlapping n-gram, keep the rest of the doc in
            # the pool (min_hits does not apply — every overlapping span
            # is masked). Runs BEFORE the quality gates, so a doc gutted
            # by masking falls to the quality floor on its own merits.
            # Untouched docs (n_removed = 0) keep their ORIGINAL text
            # byte-identical — clean_text's word rejoin is inherent to
            # span removal, but applying it corpus-wide would collapse
            # every doc to one line and blind the line-based Gopher
            # rules for documents masking never touched.
            from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
                remove_contaminated_spans,
            )

            masked = remove_contaminated_spans(
                deduped, benchmark, n=decontam_n, text_col=text_col, id_col=id_col
            ).select(
                id_col,
                F.when(F.col("n_removed") > 0, F.col("clean_text"))
                .otherwise(F.col(text_col))
                .alias("_mask_out"),
            )
            deduped = (
                deduped.drop(text_col)
                .join(masked, id_col)
                .withColumnRenamed("_mask_out", text_col)
            )
        else:
            raise ValueError(
                f"decontam_mode must be 'drop' or 'mask', got {decontam_mode!r}"
            )

    if use_gopher_rules:
        # the full Rae et al. battery replaces the heuristic trio: keep a
        # doc iff NO rule fires (gopher_quality_flags is one zero-shuffle
        # struct projection; same codegen cost class as the trio)
        flags = TX.gopher_quality_flags(F.col(text_col))
        names = (
            "too_few_words", "too_many_words", "bad_mean_word_len",
            "low_alpha_words", "mostly_bullets", "mostly_ellipsis", "repetitive",
        )
        violated = None
        for nm in names:
            f = flags.getField(nm)
            violated = f if violated is None else (violated | f)
        quality = deduped.filter(~violated)
    else:
        quality = deduped.filter(
            (TX.quality_score(F.col(text_col)) >= min_quality)
            & (TX.repeated_word_fraction(F.col(text_col)) <= max_repeated_word_frac)
            & (TX.duplicate_line_fraction(F.col(text_col)) <= max_dup_line_frac)
        )

    if blocklist is not None:
        # C4-style badwords screen (word-boundary, case-insensitive; the
        # list is caller policy) — rides with the quality gates: one more
        # stateless codegen predicate, order-independent among them
        quality = quality.filter(
            TX.blocklist_keep(F.col(text_col), blocklist, blocklist_max_hits)
        )

    if quality_model is not None:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.quality_classifier import (
            score_quality,
        )

        good = score_quality(quality, quality_model, text_col, id_col).filter(
            F.col("quality_prob") >= min_classifier_prob
        )
        quality = quality.join(good.select(id_col), id_col, "left_semi")

    if lm_model is not None and max_perplexity is not None:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.lm_quality import (
            score_perplexity,
        )

        # CCNet-style in-domain floor: docs the reference LM finds too
        # surprising are dropped; docs with < 2 tokens have no perplexity
        # row and pass through (no signal is not a rejection)
        bad = score_perplexity(quality, lm_model, text_col, id_col).filter(
            F.col("perplexity") > max_perplexity
        )
        quality = quality.join(bad.select(id_col), id_col, "left_anti")

    if keep_languages is not None:
        # language screen (the CCNet-style per-language pipeline split):
        # trust the metadata column when the caller names one, else the
        # FITTED char-n-gram classifier when a model is passed
        # (operators/language_id.fit_language_id — the real detector),
        # else the legacy stopword-argmax heuristic — stateless column
        # expression in every case, applied after the quality gates
        # (quality first: lang-ID on junk is noise)
        from vector_search_ai_assistant_mongodbvcore_spark.operators.language_id import (
            language_expr,
        )

        # min_lang_confidence (fitted-model path only): below-floor
        # predictions become 'unknown' and fall out of the screen unless
        # the caller explicitly quarantines by listing 'unknown' —
        # CCNet's actual policy for mixed/ambiguous text
        quality = quality.filter(
            language_expr(
                text_col, lang_col, lang_model, min_lang_confidence
            ).isin(*keep_languages)
        )

    if dsir_target is not None and dsir_top_k is not None:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.dsir import (
            gumbel_resample,
            importance_weights,
        )

        # importance-resample toward the target domain AFTER the quality
        # gates (weights fit on the cleaned pool, not on junk the gates
        # already reject) and BEFORE mixture/caps (which balance whatever
        # survives selection)
        weighted = importance_weights(
            quality, dsir_target, id_col=id_col, text_col=text_col,
            num_buckets=dsir_num_buckets,
        )
        kept = gumbel_resample(
            weighted, dsir_top_k, id_col=id_col, seed=seed,
            temperature=dsir_temperature,
        )
        quality = quality.join(kept.select(id_col), id_col, "left_semi")

    scrubbed = quality.withColumn(text_col, TX.scrub_pii(F.col(text_col)))

    if source_rates is not None:
        scrubbed = sample_by_rates(
            scrubbed, source_col, source_rates, id_col=id_col, seed=seed,
            default_rate=1.0,
        )

    if max_docs_per_source is not None:
        from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import cap_per_group

        scrubbed = cap_per_group(
            scrubbed, source_col, n=max_docs_per_source, id_col=id_col, seed=seed
        ).drop("cap_rank")

    labeled = assign_split(scrubbed, id_col=id_col, splits=splits, seed=seed)

    # the split label rides through the explode as a carried column — no
    # join back to the (large) document table, the chunking stage stays
    # zero-exchange (asserted in test_pipeline)
    chunks = chunk_documents(
        labeled.select(id_col, text_col, "split"),
        size=chunk_size,
        overlap=chunk_overlap,
        text_col=text_col,
        id_col=id_col,
        carry_cols=("split",),
    )
    return chunks.select(id_col, "split", "chunk_id", "n_tokens", "chunk_text")
