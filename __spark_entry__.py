"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over vector_search_ai_assistant_mongodbvcore_spark.queries — the
engine's query registry, one entry per SURVEY.md §2 operator (each Spark
implementation paired with its DuckDB oracle SQL where ANSI-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_ai_assistant_mongodbvcore_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql(sf_dir: "str | None" = None) -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query.

    `sf_dir` (optional — the driver calls with no args) pins callable
    oracles that FIT on the corpus (language_id_pred) to the same data
    the gate runs the Spark queries on; None = the driver's default
    gate corpus, sf0.01."""
    return _q.oracle_sql(sf_dir)
