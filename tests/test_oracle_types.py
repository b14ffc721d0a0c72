"""Every registered oracle must emit driver-hashable types.

DuckDB's SUM(BIGINT) returns HUGEINT, which Arrow surfaces as
decimal128(38,0); the driver's hash canonicalization distinguishes that
from Spark's int64, so an oracle that forgets `CAST(SUM(x) AS BIGINT)`
hash-mismatches even when values are identical (this is exactly how
`bpe_merge_ranking` went red in round 7). This suite executes every
registered oracle against the sf0.001 parquet and asserts no decimal
column ever reaches the comparison layer.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no test data at {SF_DIR}")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_decimal(con):
    offenders = []
    for name, sql in entry.oracle_sql().items():
        tbl = con.execute(sql).arrow()
        for field in tbl.schema:
            if "decimal" in str(field.type):
                offenders.append((name, field.name, str(field.type)))
    assert not offenders, (
        "oracle columns need CAST(... AS BIGINT/DOUBLE) guards: "
        f"{offenders}"
    )
