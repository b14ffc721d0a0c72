"""Retrieval evaluation: recall@k, MRR, nDCG@k as DataFrame aggregations.

A search engine ships with its measuring stick. Inputs follow the standard
TREC shape:

  results  (query_id, doc_id, rank)     one row per retrieved doc,
                                        rank 1 = best
  qrels    (query_id, doc_id, rel)      graded relevance, rel > 0 counts
                                        as relevant for recall/MRR

All three metrics reduce to ONE left join (results -> qrels on
query_id+doc_id) followed by ONE groupBy(query_id) aggregate and a final
mean — two shuffles total however many queries/results, each carrying one
row per retrieved doc then one row per query. No window functions, no
per-query collect: at evaluation scale (millions of queries) this is the
same bounded shape as any keyed aggregate.

nDCG uses the standard formulation: DCG = Σ rel_i / log2(rank_i + 1) over
the top-k results; IDCG from the qrels' top relevance grades sorted
descending (computed with sort_array over the per-query collected grades —
bounded by the qrels per query, which is small by construction in any
evaluation set)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate_retrieval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """One row: (n_queries, recall_at_k, mrr, ndcg_at_k) — macro-averaged
    over the queries present in `qrels` (queries with no relevant docs are
    excluded, the TREC convention; queries the engine returned nothing for
    score 0 via the right join from qrels).

    recall_at_k uses the CAPPED denominator min(n_rel, k) (the BEIR
    convention) so a query with more relevant docs than k can still reach
    1.0; divide by n_rel instead if you want classic recall."""
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(doc_col), F.col(rank_col)
    )
    q = qrels.filter(F.col(rel_col) > 0).select(
        F.col(query_col), F.col(doc_col), F.col(rel_col)
    )

    joined = r.join(q, [query_col, doc_col], "inner").select(
        query_col,
        F.col(rank_col),
        F.col(rel_col),
        (F.col(rel_col) / F.log2(F.col(rank_col) + 1)).alias("_gain"),
    )
    per_query_hits = joined.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min(rank_col).alias("best_rank"),
        F.sum("_gain").alias("dcg"),
    )

    totals = q.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_rel"),
        F.sort_array(F.collect_list(rel_col), asc=False).alias("_grades"),
    )
    # IDCG over the top-min(k, n_rel) grades; aggregate over the (small)
    # per-query grade list with explicit double accumulator
    idcg = F.aggregate(
        F.zip_with(
            F.slice("_grades", 1, k),
            F.sequence(F.lit(1), F.least(F.size("_grades"), F.lit(k))),
            lambda g, i: g.cast("double") / F.log2(i.cast("double") + 1.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    per_query = (
        totals.withColumn("_idcg", idcg)
        .join(per_query_hits, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            "n_rel",
            F.coalesce(1.0 / F.col("best_rank"), F.lit(0.0)).alias("rr"),
            F.coalesce(F.col("dcg") / F.col("_idcg"), F.lit(0.0)).alias("ndcg"),
        )
        .withColumn(
            "recall", F.col("n_hits") / F.least(F.col("n_rel"), F.lit(k))
        )
    )
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall").alias(f"recall_at_{k}"),
        F.avg("rr").alias("mrr"),
        F.avg("ndcg").alias(f"ndcg_at_{k}"),
    )
