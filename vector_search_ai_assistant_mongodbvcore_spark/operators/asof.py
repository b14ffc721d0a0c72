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
window-skew caveat; salt via operators/skew.py if a key dominates.
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
) -> DataFrame:
    """Left as-of join. Every left row survives (LEFT semantics); matched
    right values arrive as columns `<col><suffix>` (the right's time column
    included), null when no right row qualifies.

    direction='backward': latest right with right.on <= left.on (inclusive)
    direction='forward':  earliest right with right.on >= left.on
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    reserved = {"_t", "_side", "_rv", "_m"} & set(left.columns)
    if reserved:
        raise ValueError(f"left columns collide with asof internals: {sorted(reserved)}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    carried = [on, *[c for c in right_cols if c != on]]

    rv = F.struct(*[F.col(c).alias(c) for c in carried]).alias("_rv")
    r = right.select(*by, F.col(on).alias("_t"), F.lit(0).alias("_side"), rv)
    lv_null = F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv")
    l = left.select(*left.columns, F.col(on).alias("_t"), F.lit(1).alias("_side"), lv_null)
    # align: right rows need the left's full column set as nulls
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = r.select(*l.columns).unionByName(l)

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_t", "_side", "_rv")
    for c in carried:
        out = out.withColumn(f"{c}{suffix}", F.col("_m").getField(c))
    return out.drop("_m")
