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
