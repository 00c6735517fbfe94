"""Exactly-once file sink for Structured Streaming via idempotent
`foreachBatch` writes.

Structured Streaming's `foreachBatch` gives at-least-once delivery: after
a crash, the last uncommitted micro-batch REPLAYS with the same
`batch_id`. A sink that blindly appends therefore duplicates rows. The
standard recipe — documented in the Spark Structured Streaming guide — is
to make the write idempotent on `batch_id`; here that is dynamic
partition overwrite into a `_batch_id=<n>` directory: replaying batch N
atomically replaces batch N's output and nothing else.

Scale notes:
- Dynamic partition overwrite touches ONLY the replayed batch's
  directory; committed batches are never rewritten, so a 100 TB history
  is immune to replays.
- The `_batch_id` partition column also gives consumers a commit ledger:
  `read_exactly_once` reads the directory like any parquet table (the
  partition column is pruned out), and a monitoring job can diff the max
  `_batch_id` against the checkpoint for lag.
- Works with any query shape (append/update) because idempotency lives in
  the sink, not the aggregation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["exactly_once_parquet_sink", "write_batch_idempotent", "read_exactly_once"]


def write_batch_idempotent(df: DataFrame, batch_id: int, out_dir: str) -> None:
    """Idempotently write one micro-batch: dynamic-partition-overwrite the
    `_batch_id=<batch_id>` directory. Re-running the same (df, batch_id)
    replaces the directory with identical content — a replay is a no-op
    in effect."""
    # Per-write option, NOT a session-conf toggle: two concurrent
    # foreachBatch queries sharing one session must not race on a global
    # conf (a restore to 'static' mid-write would turn a replay into a
    # full-table overwrite).
    (
        df.withColumn("_batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(out_dir)
    )


def exactly_once_parquet_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str
):
    """Start the stream with the idempotent foreachBatch sink; returns the
    StreamingQuery (caller awaits termination). availableNow-friendly."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: write_batch_idempotent(df, bid, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_exactly_once(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the sink output as a plain table (partition column dropped)."""
    return spark.read.parquet(out_dir).drop("_batch_id")
