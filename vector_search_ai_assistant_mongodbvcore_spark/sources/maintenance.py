"""Auto-maintenance for append-heavy partitioned stores (the streaming
sinks' OPTIMIZE job).

The near-real-time add paths are APPENDS by design — LshIndex/IvfIndex/
Bm25Index add_documents lands new part-files into existing hive
partitions (operators/similarity.py, ivf.py, keyword_search.py), and
every micro-batch adds another file set. Scan cost therefore grows with
BATCH COUNT, not data size: a partition holding 1,000 tiny files from
1,000 micro-batches lists/opens 1,000 footers to serve what one file
could. This module is the Delta OPTIMIZE analog for those raw
partitioned dirs (BucketedTable has its own compact()): rewrite exactly
the partitions whose file count crossed a threshold, via dynamic-
partition overwrite, leaving every other partition's files untouched.

Wired into the streaming sinks as a cadence knob
(`streaming/incremental.py start_*_change_stream(compact_every=N)`) so
long-running ingest keeps per-partition file counts — and thus
micro-batch latency — bounded without an external maintenance job.

Concurrency note: dynamic-partition overwrite of a partition that a
concurrent writer is appending into can drop the concurrent append
(read-before-write). Run compaction from the SAME sink that owns the
writes (the wiring here), or under an external schedule when the stream
is idle. The versioned-table layer (managed_table.py) has optimistic
concurrency for stores that need compaction to race writers safely.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["partition_file_counts", "compact_partitioned_dir"]


def _plane(plane):
    from vector_search_ai_assistant_mongodbvcore_spark.sources import managed_table as _mt

    return plane if plane is not None else _mt._DEFAULT_DATAPLANE


def partition_file_counts(
    data_dir: str, partition_cols: "list[str]", plane=None
) -> dict:
    """{partition-value-tuple: parquet-file count} for a hive-partitioned
    dir — the observability hook the bounded-file-count tests assert on.
    Values are the RAW directory strings (e.g. '3', 'north'), exactly as
    written in the partition path. Listing goes through the data plane
    (r13), so the index tablespace counts files on an object store the
    same way; non-matching dirs (non-`col=` segments) are skipped."""
    plane = _plane(plane)
    root = data_dir.rstrip("/")
    counts: dict[tuple, int] = {}
    for f in plane.list_parquet_at_depth(root, len(partition_cols)):
        segs = f[len(root) + 1 :].split("/")[:-1]
        if len(segs) != len(partition_cols) or not all(
            seg.startswith(f"{c}=") for seg, c in zip(segs, partition_cols)
        ):
            continue
        key = tuple(seg.split("=", 1)[1] for seg in segs)
        counts[key] = counts.get(key, 0) + 1
    return counts


def compact_partitioned_dir(
    spark: SparkSession,
    data_dir: str,
    partition_cols: "list[str]",
    max_files: int = 8,
    plane=None,
) -> int:
    """Rewrite every partition of `data_dir` whose parquet-file count is
    >= max_files down to a repartition(1)-per-partition file set; returns
    the number of partitions rewritten (0 = nothing crossed the
    threshold, zero IO). Touched partitions are selected by comparing
    the partition COLUMNS (string-cast, matching the hive dir encoding)
    so only fat partitions are read and rewritten — dynamic-partition
    overwrite leaves the rest byte-identical."""
    if max_files <= 1:
        raise ValueError(f"max_files must be > 1, got {max_files}")
    fat = [k for k, n in partition_file_counts(data_dir, partition_cols, plane).items()
           if n >= max_files]
    if not fat:
        return 0
    scan = spark.read.parquet(data_dir)
    cond = None
    for key in fat:
        one = None
        for c, v in zip(partition_cols, key):
            # __HIVE_DEFAULT_PARTITION__ is hive's NULL dir; the engine's
            # partition keys are never NULL, but don't mis-prune if one is
            eq = (
                F.col(c).isNull()
                if v == "__HIVE_DEFAULT_PARTITION__"
                else F.col(c).cast("string") == F.lit(v)
            )
            one = eq if one is None else (one & eq)
        cond = one if cond is None else (cond | one)
    (
        scan.filter(cond)
        .repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(data_dir)
    )
    spark.catalog.refreshByPath(data_dir)
    return len(fat)
