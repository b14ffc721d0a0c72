"""End-to-end corpus preparation pipeline (operators/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
    prepare_training_corpus,
)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (0, "src0", "the spark engine joins tables for fast analytics work today"),
        (1, "src0", "the spark engine joins tables for fast analytics work today"),  # dup of 0
        (2, "src0", "spam spam spam spam spam spam spam spam"),  # repetition filter
        (3, "src1", "email me at a@b.com about the data pipeline we are building"),
        (4, "src1", "x"),  # too short -> quality floor
        (5, "src1", "a clean second document with plenty of ordinary words to keep it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pipeline_stages_apply(spark, raw):
    out = prepare_training_corpus(
        raw, min_quality=0.1, chunk_size=6, chunk_overlap=2
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert len(ids & {0, 1}) == 1  # exactly one of the duplicate pair
    assert 2 not in ids  # repetition-filtered
    assert 4 not in ids  # quality floor
    assert 3 in ids and 5 in ids
    # PII scrubbed before chunking
    text3 = " ".join(
        r["chunk_text"] for r in sorted(
            (r for r in out if r["doc_id"] == 3), key=lambda r: r["chunk_id"]
        )
    )
    assert "<EMAIL>" in text3 and "a@b.com" not in text3
    # one split label per doc (no leakage across chunks)
    for d in ids:
        assert len({r["split"] for r in out if r["doc_id"] == d}) == 1


def test_pipeline_deterministic(spark, raw):
    a = prepare_training_corpus(raw, min_quality=0.1).collect()
    b = prepare_training_corpus(raw, min_quality=0.1).collect()
    key = lambda r: (r["doc_id"], r["chunk_id"])
    assert sorted(map(tuple, a), key=lambda t: t[:3]) == sorted(map(tuple, b), key=lambda t: t[:3])


def test_pipeline_source_rates(spark, raw):
    out = prepare_training_corpus(
        raw, min_quality=0.1, source_rates={"src1": 0.0}
    ).collect()
    assert all(r["doc_id"] in (0, 1) for r in out)  # src1 dropped entirely


def test_pipeline_on_real_corpus(spark, tables):
    out = prepare_training_corpus(tables["documents"])
    rows = out.count()
    assert rows > 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_pipeline_chunking_adds_no_exchange(spark, tables):
    """The split label is CARRIED through the explode, not rejoined: the
    full pipeline's plan must contain zero extra Exchange vs bare chunking
    over the same filtered docs (the rejoin it replaces shuffled the
    biggest table in the pipeline)."""
    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import plan_report

    full = prepare_training_corpus(tables["documents"])
    rep = plan_report(full)
    # exact dedup's keep-set needs one aggregate exchange + its broadcast;
    # chunking itself must add none: total exchanges stay at the dedup cost
    from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import exact_dedup

    keep_rep = plan_report(exact_dedup(tables["documents"]))
    assert rep.exchanges == keep_rep.exchanges, (
        f"pipeline {rep.exchanges} vs dedup-only {keep_rep.exchanges}:\n{rep.raw[:3000]}"
    )
    assert "SortMergeJoin" not in rep.raw


def test_pipeline_chunks_carry_correct_split(spark, raw):
    """Every chunk's split equals its document's split label."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.splits import assign_split

    docs = assign_split(raw, id_col="doc_id").select("doc_id", "split")
    want = {r["doc_id"]: r["split"] for r in docs.collect()}
    out = prepare_training_corpus(raw, min_quality=0.0).collect()
    assert out
    for r in out:
        assert r["split"] == want[r["doc_id"]], r


def test_decontamination_stage_drops_benchmark_overlap(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from pyspark.sql import functions as F

    docs = tables["documents"]
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    base = prepare_training_corpus(corpus)
    screened = prepare_training_corpus(
        corpus, benchmark=bench, decontam_n=5, decontam_min_hits=1
    )
    base_ids = {r.doc_id for r in base.select("doc_id").distinct().collect()}
    kept_ids = {r.doc_id for r in screened.select("doc_id").distinct().collect()}
    assert kept_ids <= base_ids
    # the screen actually fires on this corpus (4 contaminated docs at n=5)
    from vector_search_ai_assistant_mongodbvcore_spark.operators.decontam import (
        contamination_report,
    )

    contaminated = {
        r.doc_id
        for r in contamination_report(corpus, bench, n=5).filter("contaminated").collect()
    }
    assert contaminated
    assert not (kept_ids & contaminated)
    assert base_ids - kept_ids <= contaminated  # nothing else was dropped


def test_classifier_floor_stage(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators import quality_classifier as QC
    from pyspark.sql import functions as F

    docs = tables["documents"]
    labeled = docs.withColumn("label", (F.col("doc_id") % 2 == 0).cast("int"))
    model = QC.fit_quality_classifier(labeled)
    base = prepare_training_corpus(docs)
    floored = prepare_training_corpus(docs, quality_model=model, min_classifier_prob=0.5)
    base_ids = {r.doc_id for r in base.select("doc_id").distinct().collect()}
    kept = {r.doc_id for r in floored.select("doc_id").distinct().collect()}
    assert kept <= base_ids
    # every kept doc scores above the floor
    probs = {
        r.doc_id: r.quality_prob for r in QC.score_quality(docs, model).collect()
    }
    for d in kept:
        assert probs[d] >= 0.5


def test_perplexity_ceiling_stage(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.lm_quality import (
        fit_bigram_lm,
        score_perplexity,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from pyspark.sql import functions as F

    docs = tables["documents"]
    lm = fit_bigram_lm(docs, vocab_size=500)
    # pick a ceiling at the corpus median so the stage provably fires
    ppl = score_perplexity(docs, lm)
    med = ppl.agg(F.percentile(F.col("perplexity"), F.lit(0.5))).first()[0]
    base = prepare_training_corpus(docs)
    capped = prepare_training_corpus(docs, lm_model=lm, max_perplexity=float(med))
    base_ids = {r.doc_id for r in base.select("doc_id").distinct().collect()}
    kept = {r.doc_id for r in capped.select("doc_id").distinct().collect()}
    assert kept < base_ids  # strictly fewer docs survive
    scores = {r.doc_id: r.perplexity for r in ppl.collect()}
    for d in kept:
        assert d not in scores or scores[d] <= med


def test_gopher_rules_quality_stage(spark, tables):
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        gopher_quality_flags,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.pipeline import (
        prepare_training_corpus,
    )
    from pyspark.sql import functions as F

    docs = tables["documents"]
    out = prepare_training_corpus(docs, use_gopher_rules=True)
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    # every surviving doc violates no rule; every clean doc that survives
    # dedup is present
    flags = {
        r.doc_id: r.f.asDict()
        for r in docs.select("doc_id", gopher_quality_flags("text").alias("f")).collect()
    }
    for d in kept:
        assert not any(flags[d].values()), (d, flags[d])
    # the battery actually gates: some docs survive, some are dropped
    # (~284 of 500 pass the rules at sf0.001 — median doc is 56 words, so
    # the 50-word floor is live)
    assert kept
    assert len(kept) < docs.count()


def test_dsir_selection_stage(spark, tables):
    """DSIR stage keeps exactly dsir_top_k docs, biased toward the target
    domain, and composes with the rest of the pipeline."""
    docs = tables["documents"]
    target = docs.filter(F.col("source").isin("src0", "src1")).select("text")
    out = prepare_training_corpus(
        docs, min_quality=0.0, chunk_size=1000, chunk_overlap=0,
        dsir_target=target, dsir_top_k=50, dsir_num_buckets=2000,
    )
    ids = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert len(ids) == 50
    # deterministic
    ids2 = {
        r["doc_id"]
        for r in prepare_training_corpus(
            docs, min_quality=0.0, chunk_size=1000, chunk_overlap=0,
            dsir_target=target, dsir_top_k=50, dsir_num_buckets=2000,
        ).select("doc_id").distinct().collect()
    }
    assert ids == ids2


def test_per_source_cap_stage(spark, tables):
    docs = tables["documents"]
    out = prepare_training_corpus(
        docs, min_quality=0.0, chunk_size=1000, chunk_overlap=0,
        max_docs_per_source=5,
    )
    per_src = (
        out.select("doc_id").distinct()
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").count().collect()
    )
    assert per_src and all(r["count"] <= 5 for r in per_src)
    # cap_rank is internal — it must not leak into the chunk schema
    assert "cap_rank" not in out.columns


def test_language_screen_stage(spark, tables):
    docs = tables["documents"]
    # metadata-column screen: only labeled-en docs survive
    out = prepare_training_corpus(
        docs, min_quality=0.0, chunk_size=1000, chunk_overlap=0,
        keep_languages=("en",), lang_col="lang",
    )
    kept = out.select("doc_id").distinct().join(docs, "doc_id")
    assert kept.filter(F.col("lang") != "en").count() == 0
    assert kept.count() > 0
    # detected-language screen runs the engine's own language_id
    out2 = prepare_training_corpus(
        docs, min_quality=0.0, chunk_size=1000, chunk_overlap=0,
        keep_languages=("en", "de"),
    )
    from vector_search_ai_assistant_mongodbvcore_spark.functions import text as TX

    kept2 = out2.select("doc_id").distinct().join(docs, "doc_id")
    bad = kept2.filter(~TX.language_id(F.col("text")).isin("en", "de")).count()
    assert bad == 0 and kept2.count() > 0


@pytest.fixture(scope="module")
def neardup_raw(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen sleepy "
        "ducks waddle past the old stone mill beside the river carrying "
        "baskets of ripe golden apples toward the market square"
    )
    rows = [
        (0, "src0", base),
        # near-dup of 0, NOT exact: five extra trailing words -> higher
        # word count -> strictly higher heuristic quality_score
        (1, "src0", base + " just before the evening bell"),
        (2, "src1", "a completely different document about spark query "
                    "planning and distributed shuffle behavior with plenty "
                    "of ordinary words to keep it well clear of the pair"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


_ND = dict(
    min_quality=0.1, chunk_size=1000, chunk_overlap=0,
    neardup_minhash=True, neardup_num_hashes=16, neardup_bands=8,
    neardup_shingle_size=3,
)


def test_fuzzy_dedup_stage_off_keeps_both(spark, neardup_raw):
    ids = {r["doc_id"] for r in prepare_training_corpus(
        neardup_raw, min_quality=0.1, chunk_size=1000, chunk_overlap=0
    ).collect()}
    assert {0, 1, 2} <= ids  # near-dups are not exact dups


def test_fuzzy_dedup_stage_component_and_greedy_keep_min_id(spark, neardup_raw):
    for keep in ("component", "greedy"):
        ids = {r["doc_id"] for r in prepare_training_corpus(
            neardup_raw, neardup_keep=keep, **_ND
        ).collect()}
        assert ids == {0, 2}, f"{keep}: {ids}"


def test_fuzzy_dedup_stage_best_quality_keeps_better_copy(spark, neardup_raw):
    # doc 1 is the longer (higher quality_score) member of the cluster
    ids = {r["doc_id"] for r in prepare_training_corpus(
        neardup_raw, neardup_keep="best_quality", **_ND
    ).collect()}
    assert ids == {1, 2}


def test_fuzzy_dedup_stage_rejects_unknown_policy(spark, neardup_raw):
    with pytest.raises(ValueError, match="neardup_keep"):
        prepare_training_corpus(neardup_raw, neardup_keep="nope", **_ND)


def test_decontam_mask_mode_keeps_masked_doc(spark):
    bench_text = "the quick brown fox jumps over the lazy dog"
    padding = (
        "meanwhile a perfectly ordinary paragraph about data engineering "
        "continues with many additional plain words that carry no overlap "
        "whatsoever and keep the document comfortably above the floor"
    )
    rows = [
        (0, "src0", padding + " " + bench_text),     # partially contaminated
        (1, "src0", padding + " and a second clean closing sentence"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    common = dict(min_quality=0.1, chunk_size=1000, chunk_overlap=0,
                  benchmark=bench, decontam_n=3)
    dropped = prepare_training_corpus(raw, decontam_mode="drop", **common)
    assert {r["doc_id"] for r in dropped.collect()} == {1}
    masked = prepare_training_corpus(raw, decontam_mode="mask", **common)
    out = {r["doc_id"]: r for r in masked.collect()}
    assert set(out) == {0, 1}  # doc 0 survives with the passage excised
    assert "quick brown" not in out[0]["chunk_text"]
    assert "data engineering" in out[0]["chunk_text"]
    with pytest.raises(ValueError, match="decontam_mode"):
        prepare_training_corpus(raw, decontam_mode="nope", **common)


def test_dedupe_doc_lines_stage(spark):
    pad = ("with abundant additional ordinary words keeping the document "
           "above every heuristic quality floor in use here today")
    body = f"real content {pad}"
    rows = [
        (0, "src0", f"nav bar\n{body}\nnav bar\nnav bar"),
        (1, "src0", f"nav bar\nnav bar\n{body}\nnav bar"),  # same after line dedup
    ]
    raw = spark.createDataFrame(rows, "doc_id long, source string, text string")
    common = dict(min_quality=0.1, chunk_size=1000, chunk_overlap=0)
    off = {r["doc_id"] for r in prepare_training_corpus(raw, **common).collect()}
    assert off == {0, 1}  # raw texts differ -> both survive exact dedup
    on = prepare_training_corpus(raw, dedupe_doc_lines=True, **common)
    out = on.collect()
    # cleaned texts are identical -> exact dedup collapses the pair
    assert {r["doc_id"] for r in out} == {0}
    assert "nav bar nav bar" not in " ".join(r["chunk_text"] for r in out)


def test_mask_mode_preserves_line_structure_of_untouched_docs(spark):
    """Masking must not rewrite untouched docs: their newlines survive,
    so line-based Gopher rules (duplicate-line boilerplate) still fire
    in mask mode exactly as in drop mode."""
    line = "identical boilerplate navigation line with several words"
    boiler = "\n".join([line] * 9 + ["one unique closing line here"])
    clean = "\n".join(
        f"unique content line {i} carrying ordinary words forward" for i in range(10)
    )
    rows = [(0, "src0", boiler), (1, "src0", clean)]
    raw = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark sentence nothing shares")],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(
        raw, use_gopher_rules=True, benchmark=bench, decontam_mode="mask",
        chunk_size=1000, chunk_overlap=0,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}  # boilerplate doc still gated on its line structure
