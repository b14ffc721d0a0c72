"""Dataset profiling: per-column statistics in ONE aggregate pass.

Training-data pipelines publish dataset cards (row counts, null fractions,
cardinalities, numeric distributions) for every corpus snapshot; computing
them naively is one pass per column per statistic. This operator computes
every statistic for every requested column in a SINGLE map-side-combined
aggregate over one scan, then pivots the one-row result to long format
in-plan (explode of a struct array — no driver collect):

  column      name
  n_nonnull   count(col)
  n_null      count(*) - count(col)
  n_distinct  count(DISTINCT col)   (exact; see scale note)
  min / max   cast to string (works for every orderable type)
  p25/p50/p75 exact linear-interpolation percentiles (numeric cols only,
              Spark `percentile` — matches numpy/DuckDB quantile_cont)

Scale notes: one scan however many columns; the multi-count_distinct
aggregate plans as Spark's expand + two-phase aggregate — exact but it
multiplies shuffle rows by the number of DISTINCT aggregates. For quick
profiles of very wide tables pass approx_distinct=True to switch to HLL
approx_count_distinct (single-phase, constant memory per column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    approx_distinct: bool = False,
    approx_percentiles: bool = False,
    percentile_accuracy: int = 10_000,
) -> DataFrame:
    """Long-format profile, one output row per column. Complex-typed
    columns (array/map/struct/binary) are skipped — profile their exploded
    or derived forms instead.

    approx_percentiles=True switches exact `percentile` (which buffers a
    value->count map per aggregate — exact, but memory grows with the
    column's distinct-value count, the wrong trade for high-cardinality
    numerics at corpus scale) to `percentile_approx` (Greenwald-Khanna
    sketch, memory bounded by `percentile_accuracy` regardless of input
    size; error <= 1/accuracy of rank). The 100 TB dataset-card profile
    is approx_distinct=True + approx_percentiles=True: every accumulator
    constant-memory, still one scan."""
    fields = {
        f.name: f.dataType
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    }
    cols = list(fields) if columns is None else [c for c in columns if c in fields]
    if not cols:
        raise ValueError("no profilable (scalar-typed) columns selected")

    distinct_fn = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            distinct_fn(F.col(c)).alias(f"{c}__d"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
        if isinstance(fields[c], _NUMERIC):
            pcts = F.array(*[F.lit(p) for p in percentiles])
            aggs.append(
                (
                    F.percentile_approx(
                        F.col(c).cast("double"), pcts, F.lit(percentile_accuracy)
                    ).cast("array<double>")
                    if approx_percentiles
                    else F.percentile(F.col(c).cast("double"), pcts)
                ).alias(f"{c}__p")
            )
    one = df.agg(*aggs)

    null_p = F.lit(None).cast("array<double>")
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_nonnull"),
            (F.col("_rows") - F.col(f"{c}__n")).alias("n_null"),
            F.col(f"{c}__d").alias("n_distinct"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            (F.col(f"{c}__p") if isinstance(fields[c], _NUMERIC) else null_p).alias(
                "percentiles"
            ),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def domain_audit(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus audit: the rollup a data curator reads before
    deciding caps, mixtures, and filters (one row per (source, lang)):

      n_docs        documents in the domain
      total_words   whitespace token supply (the mixture planner's unit)
      avg_words     total_words / n_docs
      token_share   total_words / corpus-wide total
      dup_docs      docs whose normalized-text fingerprint occurs more
                    than once CORPUS-WIDE (cross-domain duplicates count
                    in every domain holding a copy — that is the number a
                    curator needs: "how much of this domain is copies")
      dup_ratio     dup_docs / n_docs

    Shape: one fingerprint hash-aggregate over the corpus (the exact-
    dedup aggregate), whose counts rejoin the corpus on the fingerprint
    key (both sides hash-partitioned on _fp, AQE-planned); everything
    then reduces in ONE map-side-combined group-by over the domain keys,
    and the corpus-wide word total joins in as a broadcast one-row
    aggregate. Counts are exact longs; the three ratios are single IEEE
    divisions — deterministic in any engine.
    """
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        fingerprint_md5,
        word_count,
    )

    gcols = list(group_cols)
    base = df.select(
        *gcols,
        F.col(id_col),
        # NULL text audits as empty text (a NULL fingerprint would fall out
        # of the inner join on _fp and silently drop the row)
        fingerprint_md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_fp"),
        word_count(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("_words"),
    )
    fp_counts = base.groupBy("_fp").agg(F.count(F.lit(1)).alias("_fp_n"))
    audited = base.join(fp_counts, "_fp")
    per_domain = audited.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_words").alias("total_words"),
        F.sum(F.when(F.col("_fp_n") > 1, 1).otherwise(0)).alias("dup_docs"),
    )
    total = per_domain.agg(F.sum("total_words").alias("_corpus_words"))
    return per_domain.crossJoin(F.broadcast(total)).select(
        *gcols,
        "n_docs",
        "total_words",
        (F.col("total_words").cast("double") / F.col("n_docs").cast("double")).alias(
            "avg_words"
        ),
        (
            F.col("total_words").cast("double") / F.col("_corpus_words").cast("double")
        ).alias("token_share"),
        "dup_docs",
        (F.col("dup_docs").cast("double") / F.col("n_docs").cast("double")).alias(
            "dup_ratio"
        ),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
) -> DataFrame:
    """Tokens-per-word by group — the tokenizer-bias diagnostic a
    multilingual corpus audit publishes (a tokenizer trained on English
    commonly spends 2-3x the tokens per word on other scripts, which
    silently skews any token-budgeted mixture toward English content).

    One map-side-combined aggregate: per group, n_docs, whitespace word
    supply, engine-tokenizer token supply (F6 — tiktoken when importable,
    the BPE-ish regex fallback otherwise), and
    fertility = total_tokens / total_words (NULL when a group has no
    words). Exact long sums; the ratio is a single IEEE division.
    """
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import word_count
    from vector_search_ai_assistant_mongodbvcore_spark.functions.tokenizer import (
        approx_token_count,
    )

    gcols = list(group_cols)
    t = F.coalesce(F.col(text_col), F.lit(""))
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(word_count(t).cast("long")).alias("total_words"),
        F.sum(approx_token_count(t).cast("long")).alias("total_tokens"),
    )
    return agg.withColumn(
        "fertility",
        F.when(
            F.col("total_words") > 0,
            F.col("total_tokens").cast("double") / F.col("total_words").cast("double"),
        ),
    )


def pii_report(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source",),
    text_col: str = "text",
) -> DataFrame:
    """Per-domain PII incidence — the audit a curator reads before deciding
    where scrub_pii is load-bearing versus where a domain should be dropped
    outright (a source that is 40% phone numbers is a directory dump, not
    prose).

    One map-side-combined aggregate per group: n_docs, docs_with_pii (any
    category hit), and the per-category hit totals of
    functions/text.pii_hit_counts — counts agree with what scrub_pii
    would redact, category precedence included. NULL text counts as
    clean. Exact longs; one ratio division.
    """
    from vector_search_ai_assistant_mongodbvcore_spark.functions.text import (
        _PII_PATTERNS,
        pii_hit_counts,
    )

    gcols = list(group_cols)
    counts = pii_hit_counts(F.coalesce(F.col(text_col), F.lit("")))
    names = [name for name, _, _ in _PII_PATTERNS]
    staged = df.select(*gcols, counts.alias("_pii"))
    total = None
    for n in names:
        c = F.col("_pii").getField(n)
        total = c if total is None else total + c
    staged = staged.withColumn("_total", total)
    agg = staged.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("_total") > 0, 1).otherwise(0)).alias("docs_with_pii"),
        *[F.sum(F.col("_pii").getField(n).cast("long")).alias(f"{n}_hits") for n in names],
    )
    return agg.withColumn(
        "pii_doc_rate",
        F.col("docs_with_pii").cast("double") / F.col("n_docs").cast("double"),
    )
