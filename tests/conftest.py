"""Shared Spark session + testdata fixtures.

One session-scoped local[4] SparkSession for the whole suite (JVM startup is
~10 s; per-test sessions would dominate runtime). Shuffle partitions dropped
to 4 — the suite runs on fixture-sized data where 32 partitions are pure
scheduling overhead.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from vector_search_ai_assistant_mongodbvcore_spark import get_spark

    s = get_spark(app_name="vsai-tests", cpus=4)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from vector_search_ai_assistant_mongodbvcore_spark import load_tables

    return load_tables(spark, SF_DIR)
