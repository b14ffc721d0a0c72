"""As-of (time-travel) join: for each left row, the latest right row
at-or-before it (backward) or earliest at-or-after (forward), per key.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); a naive range join
explodes into an O(L×R) inequality join per key. The distributed shape that
survives 100 TB is the UNION + ORDERED WINDOW construction:

  1. tag right rows side=0 carrying struct(right-values), left rows side=1
     carrying null
  2. union by name -> ONE shuffle on the key, sort within partition by
     (time, side)  [backward; time desc for forward]
  3. last(value_struct, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
     — each left row picks up the most recent right struct
  4. keep side=1, unpack the struct

Cost: one hash shuffle of L+R rows + an in-partition sort — identical to any
keyed window; no row multiplication at any point. Ties: a right row at
exactly the left row's time matches (side 0 sorts first), the inclusive
`>=` ASOF convention. Right rows should be unique per (key, time) — callers
dedupe (e.g. max(id) per key,time) or accept the last one in struct-field
order, which is engine-dependent; the registered query dedupes.

The per-key partitioning means one hot key lands in one task, the standard
window-skew caveat. `num_slices` is the salting answer (the skew.py
equi-join recipe adapted to ordered windows, where a random salt would
break the time ordering): the time axis is cut into S range slices, every
(key, slice) becomes its own window partition, and each slice is seeded
with the carry-in value — the latest right row from all earlier slices —
computed on the tiny per-(key, slice) summary frame first. A key owning
half the table then spreads across S tasks instead of one, at the cost of
one extra bounded shuffle (≤ one summary row per (key, slice) that has
right rows) plus a 2-value min/max stats read.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | Sequence[str] = "user_id",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    num_slices: int | None = None,
) -> DataFrame:
    """Left as-of join. Every left row survives (LEFT semantics); matched
    right values arrive as columns `<col><suffix>` (the right's time column
    included), null when no right row qualifies.

    direction='backward': latest right with right.on <= left.on (inclusive)
    direction='forward':  earliest right with right.on >= left.on

    num_slices=S salts the window against hot keys by range-slicing the
    time axis (module docstring): results are identical, the per-key window
    partition becomes per-(key, slice). Use when one key owns a large share
    of rows; costs one bounded summary shuffle + a min/max stats read.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if num_slices is not None and num_slices < 1:
        raise ValueError(f"num_slices must be >= 1, got {num_slices}")
    reserved = {"_t", "_side", "_rv", "_m", "_slice"} & set(left.columns)
    if reserved:
        raise ValueError(f"left columns collide with asof internals: {sorted(reserved)}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    carried = [on, *[c for c in right_cols if c != on]]

    rv = F.struct(*[F.col(c).alias(c) for c in carried]).alias("_rv")
    r = right.select(*by, F.col(on).alias("_t"), F.lit(0).alias("_side"), rv)
    rv_type = r.schema["_rv"].dataType
    lv_null = F.lit(None).cast(rv_type).alias("_rv")
    l = left.select(*left.columns, F.col(on).alias("_t"), F.lit(1).alias("_side"), lv_null)
    # align: right rows need the left's full column set as nulls
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*l.columns)

    slice_expr = _slice_column(l, r, num_slices) if num_slices and num_slices > 1 else None
    backward = direction == "backward"
    if slice_expr is None:
        u = r.unionByName(l)
        part_cols = list(by)
    else:
        r = r.withColumn("_slice", slice_expr)
        l = l.withColumn("_slice", slice_expr)
        # per-(key, slice) latest/earliest right value -> carry-in seed for
        # every LATER (backward) / EARLIER (forward) slice of the same key.
        # The seed domain must cover every slice holding LEFT rows too — a
        # left row in a right-empty slice still needs the carry-in from the
        # nearest right-bearing slice. Bounded: <= num_slices rows per key.
        pick = F.max_by("_rv", "_t") if backward else F.min_by("_rv", "_t")
        bucket_edge = r.groupBy(*by, "_slice").agg(pick.alias("_rv"))
        domain = (
            l.select(*by, "_slice")
            .unionByName(bucket_edge.select(*by, "_slice"))
            .distinct()
        )
        edged = domain.join(bucket_edge, [*by, "_slice"], "left")
        slice_order = F.col("_slice").asc() if backward else F.col("_slice").desc()
        wc = (
            Window.partitionBy(*by)
            .orderBy(slice_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            edged.withColumn("_m", F.last("_rv", ignorenulls=True).over(wc))
            .filter(F.col("_m").isNotNull())
        )
        # seed rows sort before everything in their slice (_t NULL, nulls
        # first) so last(ignorenulls) sees the carry-in as the slice's prior
        seeds = carry.select(
            *by,
            F.col("_slice"),
            F.lit(None).cast(l.schema["_t"].dataType).alias("_t"),
            F.lit(-1).alias("_side"),
            F.col("_m").alias("_rv"),
        )
        for c in l.columns:
            if c not in seeds.columns:
                seeds = seeds.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
        u = seeds.select(*l.columns).unionByName(r).unionByName(l)
        part_cols = [*by, "_slice"]

    t_order = (
        F.col("_t").asc_nulls_first() if backward else F.col("_t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    drop_cols = ["_t", "_side", "_rv"] + (["_slice"] if slice_expr is not None else [])
    out = matched.filter(F.col("_side") == 1).drop(*drop_cols)
    for c in carried:
        out = out.withColumn(f"{c}{suffix}", F.col("_m").getField(c))
    return out.drop("_m")


def _slice_column(l: DataFrame, r: DataFrame, num_slices: int):
    """Range-slice assignment over the union's time span: a 2-value min/max
    stats read (driver-side, like the engine's other meta reads), then a
    pure column expression. Returns None when the span is degenerate (all
    rows share one time) — slicing would be a no-op."""
    both = l.select(F.col("_t").cast("double").alias("_d")).unionAll(
        r.select(F.col("_t").cast("double").alias("_d"))
    )
    row = both.agg(F.min("_d").alias("lo"), F.max("_d").alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or hi <= lo:
        return None
    width = (hi - lo) / num_slices
    raw = F.floor((F.col("_t").cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(F.lit(num_slices - 1), F.greatest(F.lit(0), raw)).cast("int")
