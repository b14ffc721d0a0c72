"""Keyword (BM25) search and hybrid keyword+vector retrieval.

The reference serves RAG retrieval purely through its vector index
(MongoDbService.cs:194-223 $search.cosmosSearch); production successors of
that stack (Azure Cognitive Search / MongoDB Atlas) pair the vector path
with a BM25 keyword path and fuse the two rankings with Reciprocal Rank
Fusion. This module supplies that extended search surface Spark-first:

  bm25_scores    corpus-wide Okapi BM25 scores for one query's terms —
                 explode -> per-doc conditional aggregate with map-side
                 combine, one tiny global stats aggregate broadcast back;
                 no joins, no UDFs, pure codegen exprs (see its docstring
                 for the checkpoint/persist single-scan option)
  bm25_topk      score + TakeOrdered top-k
  ranked_topk    top-k + dense rank assignment (limit first, then a
                 window over the k survivors — never a full-corpus sort
                 into one partition)
  rrf_fuse       Reciprocal Rank Fusion of two ranked candidate lists
                 (full outer join on id; absent list contributes 0)

Scale: BM25 scoring is a single pass over the text column — explode fans
out to one row per token but the groupBy(id) partial-aggregates map-side,
so the shuffle carries one row per document (dl + one tf per query term).
The stats frame is one row and is broadcast. RRF operates on two k-row
candidate frames: rank windows run AFTER the limit, on <= n_candidates
rows. All float math is a fixed-order expression tree so a DuckDB oracle
reproduces scores bit-for-bit (modulo ln ulp, absorbed by 4dp rounding).

BM25 parameters k1=1.2, b=0.75 (the standard Robertson defaults); idf is
the Lucene-style ln((N - df + 0.5)/(df + 0.5) + 1), positive for every df.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"  # lowercase alnum runs are terms


def tokenize(col) -> "F.Column":
    """Lowercase-alnum tokenizer as a column expr: array of non-empty terms."""
    return F.array_remove(F.split(F.lower(col), TOKEN_SPLIT_RE), "")


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    checkpoint_dir: str | None = None,
    persist: bool = False,
) -> DataFrame:
    """(id, bm25) for every document containing >= 1 query term.

    N and avgdl count documents with >= 1 token (empty docs drop out of the
    token stream in any engine that builds tf from tokens — the oracle twin
    behaves identically). The per-doc score is a fixed-order sum over the
    query terms, each term's contribution computed from exact integer
    tf/df/dl/N and one ln().

    The per-doc aggregate has TWO consumers (global stats + scoring) and
    Spark does not reuse the shuffle between them, so by default the text
    column is scanned twice. Fine for one-shot queries at moderate scale;
    at 100 TB pass `checkpoint_dir` to materialize the tiny (id, dl, tf*)
    frame to parquet once (both consumers then read ~rows×6-ints, never the
    text column twice), or `persist=True` for in-memory reuse — the CALLER
    then owns the lifecycle and must unpersist after its action (same
    contract as dedup.ngram_jaccard_pairs)."""
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    toks = (
        docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term"))
    )
    perdoc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("int")).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    if checkpoint_dir is not None:
        perdoc.write.mode("overwrite").parquet(checkpoint_dir)
        perdoc = docs.sparkSession.read.parquet(checkpoint_dir)
    elif persist:
        perdoc = perdoc.persist()
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = perdoc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
        denom = tf + k1 * ((1.0 - b) + (b * F.col("dl")) / F.col("avgdl"))
        contrib = (idf * tf * (k1 + 1.0)) / denom
        score = contrib if score is None else score + contrib
    any_tf = None
    for i in range(len(terms)):
        any_tf = F.col(f"tf{i}") if any_tf is None else any_tf + F.col(f"tf{i}")
    return (
        scored.withColumn("bm25", score)
        .filter(any_tf > 0)  # integer match test — exact in both engines
        .select(F.col(id_col), F.col("bm25"))
    )


def bm25_cte_sql(
    query_terms: Sequence[str],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle twin of bm25_scores as a CTE block (no leading WITH,
    final CTE named `bm25_scored` with (id, bm25)) — SAME expression tree
    (fixed per-term order, identical parenthesization) so scores agree to
    the ulp of ln(). Callers compose: f"WITH {bm25_cte_sql(...)} SELECT"."""
    terms = list(dict.fromkeys(query_terms))
    tfs = ",\n           ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ",\n           ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"((ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * tf{i} * {k1 + 1.0!r})"
        f" / (tf{i} + {k1!r} * ((1.0 - {b!r}) + ({b!r} * dl) / avgdl)))"
        for i in range(len(terms))
    )
    return f"""toks AS (
      SELECT {id_col}, t AS term FROM (
        SELECT {id_col},
               unnest(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}')) AS t
        FROM {table}
      ) WHERE t <> ''
    ),
    perdoc AS (
      SELECT {id_col}, count(*) AS dl,
           {tfs}
      FROM toks GROUP BY {id_col}
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl,
           {dfs}
      FROM perdoc
    ),
    bm25_scored AS (
      SELECT {id_col}, {contribs} AS bm25
      FROM perdoc CROSS JOIN stats
      WHERE ({" + ".join(f"tf{i}" for i in range(len(terms)))}) > 0
    )"""


def ranked_topk(
    scored: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    round_to: int = 4,
) -> DataFrame:
    """(id, rank) of the top-k by (round(score) desc, id asc).

    Limit FIRST (TakeOrderedAndProject — each partition ships only its
    local top-k), then assign ranks with a window over the k survivors; the
    single-partition window never sees more than k rows, so this shape is
    safe at any corpus size."""
    r = F.round(F.col(score_col), round_to)
    top = scored.select(F.col(id_col), r.alias("_s")).orderBy(
        F.col("_s").desc(), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(F.col("_s").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(id_col, "rank")


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion: score(d) = Σ_lists 1/(k_rrf + rank_list(d))
    over the union of both candidate lists (Cormack et al., the standard
    hybrid-search fusion; k=60 is the canonical constant). Inputs are
    (id, rank) frames ALREADY limited to their top-n — the join is tiny."""
    a = ranked_a.withColumnRenamed("rank", "rank_a")
    bdf = ranked_b.withColumnRenamed("rank", "rank_b")
    fused = a.join(bdf, id_col, "full_outer")
    rrf = (
        F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0))
    )
    return fused.select(
        F.col(id_col),
        F.col("rank_a"),
        F.col("rank_b"),
        rrf.alias("rrf"),
    )
