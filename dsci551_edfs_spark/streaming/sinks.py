"""Exactly-once file sink for Structured Streaming via idempotent
`foreachBatch` writes.

Structured Streaming's `foreachBatch` gives at-least-once delivery: after
a crash, the last uncommitted micro-batch REPLAYS with the same
`batch_id`. A sink that blindly appends therefore duplicates rows. The
standard recipe — documented in the Spark Structured Streaming guide — is
to make the write idempotent on `batch_id`; here that is an overwrite
of the batch's own `_batch_id=<n>` directory: replaying batch N
replaces batch N's output and nothing else.

Scale notes:
- The write touches ONLY the replayed batch's directory; committed
  batches are never rewritten, so a 100 TB history is immune to
  replays.
- The `_batch_id` partition column also gives consumers a commit ledger:
  `read_exactly_once` reads the directory like any parquet table (the
  partition column is pruned out), and a monitoring job can diff the max
  `_batch_id` against the checkpoint for lag.
- Works with any query shape (append/update) because idempotency lives in
  the sink, not the aggregation state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["exactly_once_parquet_sink", "write_batch_idempotent", "read_exactly_once"]


def write_batch_idempotent(df: DataFrame, batch_id: int, out_dir: str) -> None:
    """Idempotently write one micro-batch: overwrite the
    `_batch_id=<batch_id>` directory. Re-running the same (df, batch_id)
    replaces the directory with identical content — a replay is a no-op
    in effect.

    The batch's partition directory is addressed DIRECTLY (optimization
    r14, guide §6): a batch can only ever own its own `_batch_id=<n>`
    partition, so the general dynamic-partition-overwrite machinery the
    previous spelling used — route every row through the partitionBy
    writer, diff the touched partitions, stage and swap at commit —
    bought nothing over writing that one directory, and its
    staging/commit dance cost extra driver+FS round-trips on EVERY
    micro-batch of every streaming op. The write still stages: the job
    lands in a dot-prefixed sibling (invisible to Spark's file listing)
    and the batch directory is swapped in AFTER the job succeeds — so a
    replay whose input is derived from the sink's own files (and any
    concurrent reader) never sees its source deleted mid-job, the same
    don't-clobber-what-you-read guarantee the dynamic mode's staging
    gave. Readers are unchanged: the directory name carries the
    partition value, so `spark.read.parquet(out_dir)` still discovers
    `_batch_id` as a partition column and committed batches are never
    rewritten. (On object stores without cheap rename, swap the rename
    for the committer the store provides — same contract.)"""
    import shutil

    bid = int(batch_id)
    tmp = os.path.join(out_dir, f".batch_tmp_{bid}_{os.getpid()}")
    final = os.path.join(out_dir, f"_batch_id={bid}")
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


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
