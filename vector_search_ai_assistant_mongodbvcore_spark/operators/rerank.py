"""Candidate reranking — the stage between retrieval and payload assembly.

The reference serves payloads straight from vector top-k
(ChatService.GetChatCompletionAsync builds the RAG payload from the raw
$search results); production retrieval stacks insert a (cross-encoder)
rerank over the fused candidates first. Same architecture discipline as
the other external model sources (functions/embedder.py RemoteEmbedder,
functions/completion.py): the TRANSPORT is injectable — a deterministic
local scorer keeps every test and harness run hermetic, the remote
transport is the documented production hook and raises NotImplementedError
in this container (no network).

Scale shape: candidates are already top-n (tens of rows per query) — the
scorer runs as ONE Arrow-batched pandas UDF pass over the candidate frame,
then TakeOrdered keeps k. Cost per query is n scorer calls, independent of
corpus size; the corpus-scale work happened in the retrieval legs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lexical_overlap_scorer(query: str) -> Callable[[pd.Series], pd.Series]:
    """Deterministic local stand-in for a cross-encoder: token-set Jaccard
    between the query and each candidate text. Hermetic, order-free, and
    monotone in shared vocabulary — enough structure to test the plumbing
    and to be a sane lexical fallback."""
    q = set(query.lower().split())

    def score(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> float:
            toks = set((t or "").lower().split())
            if not toks or not q:
                return 0.0
            return len(q & toks) / len(q | toks)

        return texts.map(one)

    return score


def remote_cross_encoder(query: str) -> Callable[[pd.Series], pd.Series]:
    """Production transport hook (cross-encoder scoring API). No network in
    this environment — inject your client here; the signature is the
    contract the rerank UDF calls."""

    def score(texts: pd.Series) -> pd.Series:  # pragma: no cover - env-gated
        raise NotImplementedError(
            "remote cross-encoder transport not available in this environment; "
            "inject a scorer via rerank(..., scorer=...)"
        )

    return score


def rerank(
    candidates: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    scorer_factory: Callable[[str], Callable[[pd.Series], pd.Series]] = lexical_overlap_scorer,
    keep_cols: Sequence[str] = (),
    rank_col: str | None = None,
    rrf_k: int = 60,
) -> DataFrame:
    """Score every candidate against `query` with ONE Arrow-batched pandas
    UDF and keep the top-k. Candidates should already be a top-n frame
    (tens of rows) from the retrieval legs; the rerank cost is
    per-candidate, never per-corpus-row.

    Ordering policy:
      * rank_col=None — REPLACE: order purely by (rerank_score desc, id
        asc). Correct when the scorer is strictly stronger than the
        retriever (a real cross-encoder).
      * rank_col='<retrieval rank>' — FUSE: the scorer's rank order is
        RRF-fused with the retrieval order (1/(rrf_k+r_ret) +
        1/(rrf_k+r_scr), the same constant as hybrid fusion). A weak or
        merely-different scorer then refines the retrieval order instead
        of overwriting it — the engine's own EVAL.md showed the replace
        policy with the lexical fallback scorer serving a WORSE order
        than its retrieval input, which fusion prevents by construction
        (both parents vote). Output adds `fused` (the fusion score).
    """
    scorer = scorer_factory(query)

    @F.pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        return scorer(texts).astype("float64")

    scored = candidates.withColumn("rerank_score", _score(F.col(text_col)))
    if rank_col is None:
        out_cols = [id_col, *keep_cols, "rerank_score"]
        return (
            scored.select(*out_cols)
            .orderBy(F.col("rerank_score").desc(), F.col(id_col))
            .limit(k)
        )
    # scorer rank within the candidate set: bounded window — the frame is
    # top-n by contract, so the single partition holds tens of rows
    from pyspark.sql import Window

    from vector_search_ai_assistant_mongodbvcore_spark.plans.inspect import bounded_window_key

    w = Window.partitionBy(bounded_window_key(id_col)).orderBy(F.col("rerank_score").desc(), F.col(id_col))
    fused = (
        F.lit(1.0) / (F.lit(rrf_k) + F.col(rank_col))
        + F.lit(1.0) / (F.lit(rrf_k) + F.col("_scr_rank"))
    )
    out_cols = [id_col, *keep_cols, "rerank_score", "fused"]
    return (
        scored.withColumn("_scr_rank", F.row_number().over(w))
        .withColumn("fused", fused)
        .select(*out_cols)
        .orderBy(F.col("fused").desc(), F.col(id_col))
        .limit(k)
    )
