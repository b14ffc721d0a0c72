"""Streaming exact deduplication for continuous corpus ingest (§2.7
extended surface).

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a training
-data pipeline also ingests continuously, and duplicates arrive ACROSS
micro-batches — a batch dropDuplicates inside each trigger misses them.
Spark's streaming dedup keeps a state-store entry per seen key:

  dedup_stream             exact streaming dedup on the normalized-text
                           md5 fingerprint (the same key batch exact_dedup
                           groups on, functions/text.fingerprint_md5) via
                           dropDuplicates — state grows with DISTINCT keys
                           forever; exact across the whole stream lifetime
  dedup_stream_watermarked dropDuplicatesWithinWatermark — state bounded
                           by the event-time watermark: a duplicate
                           arriving within `delay` of the original is
                           dropped, older state is evicted. The 100 TB/
                           infinite-stream shape: bounded memory, dedup
                           guarantee scoped to the watermark horizon
                           (outside it, the batch pass sweeps).

Both are pure transformations over a streaming OR batch DataFrame (batch
mode: dropDuplicates semantics are identical, which is how tests establish
the keep-set) — same contract as streaming/windows.py.

Scale notes: state is sharded by key across executors like any stateful
op; the watermarked form is the one to run unbounded (RocksDB state store,
watermark = the late-data SLA). The fingerprint is computed BEFORE the
stateful operator so the state key is a fixed 32-char hash, not the
document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_search_ai_assistant_mongodbvcore_spark.functions.text import fingerprint_md5


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Exact streaming dedup on content fingerprint: first arrival of each
    normalized text wins, every later duplicate is dropped — across
    micro-batches (state-store backed). State: one entry per distinct
    fingerprint, unbounded; use dedup_stream_watermarked for infinite
    streams."""
    return docs.withColumn("_fp", fingerprint_md5(text_col)).dropDuplicates(
        ["_fp"]
    ).drop("_fp")


def dedup_stream_watermarked(
    docs: DataFrame,
    time_col: str,
    delay: str = "30 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: duplicates arriving within
    `delay` (event time) of the first copy are dropped; fingerprints older
    than the watermark are evicted from the state store. The dedup
    guarantee is scoped to the watermark horizon — the right trade for an
    unbounded ingest stream."""
    return (
        docs.withColumn("_fp", fingerprint_md5(text_col))
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
