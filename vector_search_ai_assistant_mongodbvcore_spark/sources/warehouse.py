"""Bucketed warehouse tables: pre-shuffled layouts for repeat-join keys.

The biggest recurring cost in a 100 TB star/fact workload is re-shuffling
the same fact table on the same join key every query. Spark's answer is
bucketing: write the table hash-partitioned AND sorted by the key once
(`bucketBy` + `sortBy` via saveAsTable); every later equi-join or
aggregation on that key reads the buckets co-located and skips its
Exchange entirely — the physical plan joins with ZERO shuffle on the
bucketed side(s) (SortMergeJoin directly over the bucketed scans when both
sides share the bucketing, tests assert this).

This is the storage-layout sibling of the query-time techniques already in
the engine (broadcast for small dims, salting for skew, AQE for runtime
re-plan): pay one shuffle at WRITE time, amortize it over every read.

Bucketed tables require the session catalog (saveAsTable) — the warehouse
dir is whatever `spark.sql.warehouse.dir` points at; callers own naming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and by default sorted) managed table.
    Choose `buckets` once per key domain and reuse it on every table that
    joins on `key` — co-location requires equal bucket counts."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
