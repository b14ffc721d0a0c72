"""Data-plane overhead probe (round 13): the SAME BucketedTable mutation
workload (seed overwrite + keyed merges + predicate delete + compact +
reads) under LocalDataPlane (atomic rename publish) and
EmulatedObjectDataPlane (per-object copy+delete publish, per-object
vacuum) at two data sizes.

The 100 TB question this answers: the object plane's publish re-copies
every staged byte (a real store's server-side CopyObject — here a local
byte copy, a strictly PESSIMISTIC stand-in since S3 copies don't
round-trip through the client) and its vacuum issues one DELETE per
object. Both costs are O(bytes written) / O(files retired) per commit —
the same order as the write itself — so the wall ratio object/local
must stay a bounded constant as data grows, NOT grow with table size.
A ratio growing with scale would mean some plane call is accidentally
O(table), the cliff this probe exists to catch.

Usage: python tools/dataplane_probe.py [rows_small rows_big]
Prints one JSON line; exits nonzero if the two planes' final tables
differ (parity is the precondition for the timing to mean anything).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
    EmulatedObjectDataPlane,
    LocalDataPlane,
)
from vector_search_ai_assistant_mongodbvcore_spark.sources.managed_table import (
    BucketedTable,
    ConditionalPutCommitter,
    MemoryConditionalStore,
)


def _workload(spark, path, plane, rows: int) -> "tuple[float, list]":
    t0 = time.time()
    t = BucketedTable(
        spark,
        path,
        bucket_by=["id"],
        n_buckets=8,
        committer=ConditionalPutCommitter(MemoryConditionalStore(), plane),
    )
    base = spark.range(rows).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    t.overwrite(base)
    for i in range(4):  # keyed merges touching a slice of buckets
        t.merge(
            spark.range(i * 50, i * 50 + 200).select(
                "id", F.lit(f"merge{i}").alias("val")
            )
        )
    t.delete_where([("id", "<", 25)])
    t.compact(min_dirs=2)
    n = t.read().count()
    rows_out = sorted(
        (r["id"], r["val"]) for r in t.read().filter(F.col("id") < 400).collect()
    )
    return time.time() - t0, [n, rows_out]


def main() -> None:
    sizes = (
        [int(sys.argv[1]), int(sys.argv[2])] if len(sys.argv) > 2 else [20_000, 200_000]
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # one untimed warm workload so JIT/page-cache/codegen don't bill the
    # first measured plane (the scale_probe discipline)
    warm = tempfile.mkdtemp(prefix="dp_warm_")
    _workload(spark, f"{warm}/t", LocalDataPlane(), 2_000)
    shutil.rmtree(warm, ignore_errors=True)
    out = {"sizes": sizes, "local_s": [], "object_s": [], "ratio": []}
    ok = True
    for rows in sizes:
        results = {}
        for name, plane in (("local", LocalDataPlane()), ("object", EmulatedObjectDataPlane())):
            d = tempfile.mkdtemp(prefix=f"dp_{name}_")
            walls = []
            for _ in range(2):  # min-of-2: box drift is +/-20-40%
                shutil.rmtree(f"{d}/t", ignore_errors=True)
                wall, res = _workload(spark, f"{d}/t", plane, rows)
                walls.append(wall)
            results[name] = res
            out[f"{name}_s"].append(round(min(walls), 2))
            shutil.rmtree(d, ignore_errors=True)
        if results["local"] != results["object"]:
            ok = False
        out["ratio"].append(round(out["object_s"][-1] / out["local_s"][-1], 2))
    out["parity"] = ok
    # bounded-constant check, ENFORCED in the exit code like parity: the
    # object/local ratio must not grow with data size (15% multiplicative
    # + 0.1 additive slack for box noise — measured same-code drift on
    # this box is ±12%, BENCH_HISTORY)
    out["ratio_flat"] = out["ratio"][-1] <= out["ratio"][0] * 1.15 + 0.1
    print(json.dumps(out))
    spark.stop()
    if not (ok and out["ratio_flat"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
