"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 in Spark AND the
matching oracle_sql() in DuckDB, then compares:
  * row count
  * sorted column names
  * values: rows sorted by all columns (column order = sorted names),
    compared exactly (strings/ints) and with 0 tolerance for floats — if
    this passes, any reasonable value-hash matches.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    import datetime
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def run():
    import __spark_entry__ as entry_mod
    from vector_search_ai_assistant_mongodbvcore_spark import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry_mod.queries()
    # pass the gate's corpus so callable oracles (language_id_pred) fit
    # on the SAME data the Spark queries run on — no env-var side channel
    oracles = entry_mod.oracle_sql(SF_DIR)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_cols = sorted(sdf.columns)
            spark_rows = [
                tuple(norm_cell(row[c]) for c in spark_cols) for row in sdf.collect()
            ]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"OK*   {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.1f}s)")
            if len(spark_rows) == 0:
                print(f"      WARNING: 0 rows from {name}")
            continue
        try:
            cur = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in cur.description]
            duck_rows_raw = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        duck_cols = sorted(duck_cols_raw)
        idx = [duck_cols_raw.index(c) for c in duck_cols]
        duck_rows = [tuple(norm_cell(r[i]) for i in idx) for r in duck_rows_raw]
        problems = []
        if spark_cols != duck_cols:
            problems.append(f"schema: spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            s_sorted = sorted(spark_rows, key=repr)
            d_sorted = sorted(duck_rows, key=repr)
            mismatches = [
                (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
            ]
            if mismatches:
                problems.append(
                    f"values: {len(mismatches)} mismatched rows; first: spark={mismatches[0][0]} duck={mismatches[0][1]}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            print(f"OK    {name}: {len(spark_rows)} rows match ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("ALL MATCH")
    spark.stop()


if __name__ == "__main__":
    run()
