"""Rerank stage (operators/rerank.py): deterministic scorer, injectability,
top-k contract, end-to-end over hybrid candidates."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.operators.rerank import (
    lexical_overlap_scorer,
    remote_cross_encoder,
    rerank,
)


@pytest.fixture(scope="module")
def candidates(spark):
    rows = [
        (0, "spark hash join"),          # 3/4 overlap with query below
        (1, "spark hash join scan"),     # exact -> 1.0
        (2, "unrelated words entirely"),
        (3, "spark"),                    # 1/4
        (4, None),                       # null text -> 0.0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_and_order(spark, candidates):
    got = rerank(candidates, "spark hash join scan", k=5).collect()
    scores = {r["doc_id"]: r["rerank_score"] for r in got}
    assert scores[1] == pytest.approx(1.0)
    assert scores[0] == pytest.approx(3 / 4)
    assert scores[3] == pytest.approx(1 / 4)
    assert scores[4] == 0.0
    order = [r["doc_id"] for r in got]
    assert order == sorted(order, key=lambda d: (-scores[d], d))


def test_k_bound_and_keep_cols(spark, candidates):
    got = rerank(
        candidates.withColumn("source", F.lit("s")),
        "spark hash join scan",
        k=2,
        keep_cols=["source"],
    ).collect()
    assert len(got) == 2
    assert got[0]["source"] == "s"
    assert got[0]["doc_id"] == 1  # best match first


def test_injectable_scorer(spark, candidates):
    def reversed_scorer(query):
        def score(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: float(len(t or "")))

        return score

    got = rerank(candidates, "ignored", k=1, scorer_factory=reversed_scorer).collect()
    assert got[0]["doc_id"] == 2  # longest text wins under the injected scorer


def test_remote_transport_is_env_gated():
    with pytest.raises(NotImplementedError):
        remote_cross_encoder("q")(pd.Series(["x"]))


def test_lexical_scorer_empty_query():
    s = lexical_overlap_scorer("")(pd.Series(["anything", None]))
    assert list(s) == [0.0, 0.0]


def test_end_to_end_over_hybrid_candidates(spark, tables):
    """Retrieve (hybrid) -> join text -> rerank: the full serving chain."""
    from vector_search_ai_assistant_mongodbvcore_spark import queries as q

    hyb = q.queries()["hybrid_search_indexed"](spark, "/root/testdata/sf0.001")
    cands = hyb.join(tables["documents"].select("doc_id", "text"), "doc_id")
    out = rerank(cands, "spark hash join scan", k=5, keep_cols=["rrf"]).collect()
    assert 0 < len(out) <= 5
    assert all(r["rerank_score"] >= 0 for r in out)


def test_fused_mode_rrf_of_retrieval_and_scorer(spark):
    """rank_col fuses the scorer order with the retrieval order by RRF:
    hand-computed fusion scores, and a candidate strong on BOTH lists
    outranks one strong on only one."""
    rows = [
        # (doc_id, text, ret_rank) — query: "spark hash join scan"
        (0, "spark hash join scan", 3),   # scorer rank 1, retrieval rank 3
        (1, "spark hash join", 1),        # scorer rank 2, retrieval rank 1
        (2, "unrelated words", 2),        # scorer rank 3, retrieval rank 2
    ]
    cand = spark.createDataFrame(rows, "doc_id long, text string, ret_rank int")
    got = rerank(cand, "spark hash join scan", k=3, rank_col="ret_rank").collect()
    fused = {r.doc_id: r.fused for r in got}
    for doc, (rr, sr) in {0: (3, 1), 1: (1, 2), 2: (2, 3)}.items():
        assert fused[doc] == pytest.approx(1.0 / (60 + rr) + 1.0 / (60 + sr))
    # doc 1 (ranks 1,2) beats doc 0 (ranks 3,1) beats doc 2 (ranks 2,3)
    assert [r.doc_id for r in got] == [1, 0, 2]


def test_fused_payload_resists_bad_scorer(spark):
    """The serving-path property that set the r7 default: with a scorer
    that actively inverts quality, the fused payload still leads with the
    retrieval winner, while the replace policy serves the inversion."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.vector_search import (
        vector_search_payload_reranked,
    )

    rows = [
        (1, "relevant answer text", [1.0, 0.0]),
        (2, "zzz noise zzz", [0.8, 0.6]),
        (3, "zzz zzz zzz", [0.6, 0.8]),
    ]
    corpus = spark.createDataFrame(rows, "_id long, text string, vector array<float>")

    def inverted(query):
        def score(texts: pd.Series) -> pd.Series:
            return texts.map(lambda t: float((t or "").count("z")))
        return score

    q = [1.0, 0.0]
    fused = vector_search_payload_reranked(
        corpus, q, "relevant answer", k=3, n_candidates=3,
        scorer_factory=inverted, fuse=True,
    ).collect()[0]["payload"]
    replaced = vector_search_payload_reranked(
        corpus, q, "relevant answer", k=3, n_candidates=3,
        scorer_factory=inverted, fuse=False,
    ).collect()[0]["payload"]
    assert fused.index("relevant") < fused.index("noise")
    assert replaced.index("noise") < replaced.index("relevant")


# The EVAL.md inequality pin (rerank_fused >= every leg) lives in
# tests/test_eval.py next to the metric implementations it depends on.
