"""Round-8 trainer-facing metrics: quality-aware near-dup keep policy,
tokenizer unk-rate audit, and packing efficiency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators import packing, vocab
from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
    drop_component_duplicates,
)


def test_component_dedup_keeps_highest_quality(spark):
    # chain a~b~c plus isolated d: default keeps min id (a); quality
    # policy keeps the best-scoring member (c), ties elsewhere -> min id
    df = spark.createDataFrame(
        [(1, "a", 0.2), (2, "b", 0.9), (3, "c", 0.9), (4, "d", 0.5)],
        "doc_id long, text string, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    default = {r["doc_id"] for r in drop_component_duplicates(df, pairs).collect()}
    assert default == {1, 4}
    best = {
        r["doc_id"]
        for r in drop_component_duplicates(df, pairs, quality_col="q").collect()
    }
    # 2 and 3 tie on quality: smaller id wins, matching default determinism
    assert best == {2, 4}


def test_component_dedup_quality_with_string_ids(spark):
    df = spark.createDataFrame(
        [("x", 0.1), ("y", 0.8), ("z", 0.3)], "doc_id string, q double"
    )
    pairs = spark.createDataFrame([("x", "y"), ("y", "z")], "id_a string, id_b string")
    got = {
        r["doc_id"]
        for r in drop_component_duplicates(df, pairs, quality_col="q").collect()
    }
    assert got == {"y"}


def test_unk_report_flags_uncovered_domain(spark):
    train = spark.createDataFrame(
        [(i, "plain english words repeat here") for i in range(8)],
        "doc_id long, text string",
    )
    model = vocab.learn_bpe(train, num_merges=30)
    mixed = spark.createDataFrame(
        [
            (0, "plain english words", "en"),
            (1, "plain words repeat", "en"),
            (2, "汉字汉字 汉字", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    rep = {
        r["lang"]: r
        for r in vocab.bpe_unk_report(mixed, model, group_col="lang").collect()
    }
    assert rep["en"]["unk_tokens"] == 0 and rep["en"]["unk_rate"] == 0.0
    assert rep["zh"]["unk_rate"] > 0.5  # uncovered script -> mostly unk
    total = vocab.bpe_unk_report(mixed, model).collect()[0]
    assert total["n_docs"] == 3
    assert total["unk_tokens"] == rep["zh"]["unk_tokens"]


def test_packing_efficiency_accounts_for_tails(spark):
    seqs = spark.createDataFrame(
        [("train", 8), ("train", 8), ("train", 3), ("val", 5)],
        "split string, n_toks long",
    )
    got = {
        r["split"]: r for r in packing.packing_efficiency(seqs, seq_len=8).collect()
    }
    assert got["train"]["total_tokens"] == 19
    assert got["train"]["padded_tokens"] == 5
    assert got["train"]["efficiency"] == pytest.approx(19 / 24)
    assert got["val"]["efficiency"] == pytest.approx(5 / 8)


def test_packing_efficiency_on_real_sequences(spark):
    from vector_search_ai_assistant_mongodbvcore_spark.operators.export import (
        materialize_sequences,
    )

    docs = spark.createDataFrame(
        [(i, "train", 0, " ".join(f"w{j}" for j in range(13))) for i in range(7)],
        "doc_id long, split string, chunk_id long, chunk_text string",
    )
    seqs = materialize_sequences(docs, seq_len=16)
    row = packing.packing_efficiency(seqs, seq_len=16).collect()[0]
    # concat-and-chop: only the final sequence can be short
    assert row["padded_tokens"] < 16
    assert row["total_tokens"] == seqs.agg(F.sum("n_toks")).collect()[0][0]
    assert 0.9 <= row["efficiency"] <= 1.0


def test_quality_keep_composes_with_embedding_neardup_pairs(spark, tables):
    """The quality-keep policy is pair-source-agnostic: the same
    drop_component_duplicates(quality_col=...) that serves MinHash pairs
    runs on embedding-space near-dup pairs (semdedup/similarity emit the
    identical (id_a, id_b) shape), keeping the highest-quality member of
    each embedding cluster."""
    from pyspark.sql import functions as F

    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import quality_score
    from vector_search_ai_assistant_mongodbvcore_spark.operators.dedup import (
        neardup_components,
    )
    from vector_search_ai_assistant_mongodbvcore_spark.operators.similarity import (
        embedding_neardup,
    )

    docs = tables["documents"]
    emb = tables["embeddings"].select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    pairs = embedding_neardup(emb, threshold=0.95, id_col="doc_id")
    # column contract: similarity pair emitters produce (id_a, id_b)
    assert {"id_a", "id_b"} <= set(pairs.columns)
    scored = docs.withColumn("q", quality_score(F.col("text")))
    kept = drop_component_duplicates(scored, pairs, id_col="doc_id", quality_col="q")
    # exactly one survivor per component among docs present in the corpus
    comps = neardup_components(pairs).collect()
    comp_of = {r["node"]: r["comp"] for r in comps}
    present = {r["doc_id"] for r in docs.select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    from collections import defaultdict

    survivors = defaultdict(list)
    for n in comp_of:
        if n in present and n in kept_ids:
            survivors[comp_of[n]].append(n)
    qmap = {r["doc_id"]: r["q"] for r in scored.select("doc_id", "q").collect()}
    for comp, members in survivors.items():
        assert len(members) == 1, (comp, members)
        # the survivor is the max-quality member (id tiebreak)
        cand = [n for n in comp_of if comp_of[n] == comp and n in present]
        best = min(cand, key=lambda n: (-qmap[n], n))
        assert members[0] == best
