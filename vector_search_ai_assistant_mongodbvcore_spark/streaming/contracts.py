"""Streaming data-quality contract monitoring: the batch contract
checker (operators/contracts.py) applied per micro-batch of an
unbounded ingest stream.

Contract metrics are AGGREGATES, which Structured Streaming cannot run
ad hoc in append mode — but each micro-batch is a bounded DataFrame
inside foreachBatch, so the monitor evaluates the EXACT batch `check()`
(one map-combined agg scan of the batch, same Constraint objects, same
metric arithmetic) against every batch independently. That per-batch
granularity is the useful contract for streaming ingest anyway: "which
delivery violated expectations", not a running corpus-lifetime blend
that dilutes a bad batch into noise.

Three outputs, all exactly-once under micro-batch replays via the
repo's dynamic-partition-overwrite discipline (each batch owns its
deterministic `batch=<epoch_id>` partition, so a replayed epoch
replaces exactly itself):

  * <report_dir>/batch=<n>/   — one row per constraint per batch
    (rule, metric, passed): the monitoring history a dashboard reads.
  * <accept_dir>/batch=<n>/   — batches whose EVERY constraint passed.
  * <quarantine_dir>/batch=<n>/ — batches with any failing constraint,
    parked whole for inspection instead of silently entering the
    corpus: violating a contract is evidence about the DELIVERY (an
    upstream schema drift, a truncated extract), so the unit of
    quarantine is the delivery, not the row. Row-level hygiene is the
    quality gate's job (streaming/quality.py), which runs downstream of
    acceptance.

accept_dir/quarantine_dir are optional — report-only monitoring is the
default shape. The reference has no streaming surface at all; this is
part of the added training-data tier (the streaming twin of
data_quality_report, completing the batch==stream pattern every other
pipeline stage follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contract_report_batch", "start_contract_monitor_stream"]


def contract_report_batch(df: DataFrame, constraints, epoch_id: int) -> DataFrame:
    """The batch checker's report for one micro-batch, stamped with the
    epoch: (rule, metric, passed, batch). Shared by the stream sink and
    the parity tests so stream==batch holds by construction."""
    from vector_search_ai_assistant_mongodbvcore_spark.operators.contracts import check

    return check(df, list(constraints)).select(
        F.col("constraint").alias("rule"),
        "metric",
        "passed",
        F.lit(int(epoch_id)).alias("batch"),
    )


def start_contract_monitor_stream(
    docs: DataFrame,
    constraints,
    report_dir: str,
    checkpoint_dir: str,
    accept_dir: "str | None" = None,
    quarantine_dir: "str | None" = None,
):
    """Monitor a document stream against a declared contract; see module
    docstring for the output layout. `constraints` is the same list
    operators/contracts.check takes. Routing (accept/quarantine) is only
    active when BOTH dirs are given — a contract gate that can park a
    batch must also have somewhere to put the good ones."""
    if (accept_dir is None) != (quarantine_dir is None):
        raise ValueError(
            "accept_dir and quarantine_dir must be given together (or both "
            "omitted for report-only monitoring)"
        )
    constraints = list(constraints)
    if not constraints:
        raise ValueError("start_contract_monitor_stream needs constraints")

    def _batch(df: DataFrame, epoch_id: int) -> None:
        df = df.persist()
        try:
            if df.count() == 0:
                return
            report = contract_report_batch(df, constraints, epoch_id).persist()
            try:
                (
                    report.write.mode("overwrite")
                    .partitionBy("batch")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(report_dir)
                )
                if accept_dir is None:
                    return
                # coalesce: a NULL verdict (possible from a hand-rolled
                # Constraint) must count as a failure, not vanish from
                # min() — undetermined is not accepted
                all_passed = (
                    report.agg(
                        F.min(
                            F.coalesce(F.col("passed"), F.lit(False)).cast("int")
                        ).alias("ok")
                    )
                    .collect()[0]["ok"]
                    == 1
                )
                dest = accept_dir if all_passed else quarantine_dir
                (
                    df.withColumn("batch", F.lit(int(epoch_id)))
                    .write.mode("overwrite")
                    .partitionBy("batch")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(dest)
                )
            finally:
                report.unpersist()
        finally:
            df.unpersist()

    return (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
