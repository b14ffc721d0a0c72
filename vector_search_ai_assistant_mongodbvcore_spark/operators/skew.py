"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized shuffle partitions — but it only applies to
sort-merge joins and only splits; when one join KEY is hot (power-law user
ids, null-heavy foreign keys), the classic fix is salting: spray the skewed
side's hot key across S sub-keys and replicate the other side S times, so
the hot key's rows land on S reducers instead of one.

`salted_join` implements the standard construction:

    left (skewed):  salt = pmod(hash(monotonic row marker), S)  — random-ish
    right (small-ish per key): exploded S times, one copy per salt value
    join on (key, salt), drop the salt

Cost model: right side is replicated S×, so this is for joins where the
right side's per-key row count is modest (dims, aggregated lookups). For
aggregations no helper is needed — Spark's partial aggregation already
combines map-side, which is exactly two-phase 'salted' aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (skewed on `on`) with `right` (replicated) using
    `num_salts` sub-keys per join key. Output columns = natural join output
    (salt column removed)."""
    salt = "_salt"
    l = left.withColumn(salt, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts)))
    r = right.withColumn(salt, F.explode(F.array(*[F.lit(i) for i in range(num_salts)])))
    return l.join(r, on + [salt], how).drop(salt)
