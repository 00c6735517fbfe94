"""Global running totals WITHOUT the single-partition window trap.

An unpartitioned ``Window.orderBy`` moves the entire input through ONE
task (Spark's WindowExec warns exactly this) — the canonical accidental
100 TB bottleneck. This module provides the two-phase alternative the
engine already uses inside compaction planning (`sources/compaction.py`)
and the 256-bucket shuffle rank (`pipeline/curation.py`), generalized:

1. ``repartitionByRange`` on the order columns — balanced range buckets
   via Spark's sampled partitioner;
2. per-partition totals (``rank_partitions`` rows) come to the driver,
   their prefix sums broadcast back as each partition's global offset —
   a constant-size exchange whatever the input size;
3. the within-partition running sum runs fully parallel, and
   global = offset + within-partition prefix.

``localCheckpoint`` pins the ranged frame because two jobs consume it
(the totals collect, then the final projection) and a re-executed
repartitionByRange could re-sample different boundaries between them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["running_total", "running_max"]


def running_total(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "running_total",
    rank_partitions: int = 32,
) -> DataFrame:
    """Append ``out_col`` = the running sum of ``value_col`` in global
    ``order_cols`` order, computed two-phase (range partition +
    broadcast per-partition offsets) so the plan contains no
    single-partition window at any input size."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(rank_partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid")
        .agg(F.sum(value_col).cast("long").alias("t"))
        .collect()
    }
    acc, offs = 0, []
    for pid in range(rank_partitions):
        offs.append((pid, acc))
        acc += int(totals.get(pid, 0) or 0)
    off_df = ranged.sparkSession.createDataFrame(offs, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = list(df.columns)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(
            *keep,
            (F.col("_off") + F.sum(value_col).over(w)).cast("long").alias(out_col),
        )
    )


def running_max(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "running_max",
    rank_partitions: int = 32,
) -> DataFrame:
    """Append ``out_col`` = the running max of ``value_col`` in global
    ``order_cols`` order — same two-phase shape as ``running_total``
    (range partition, per-partition maxima to the driver, prefix-max
    offsets broadcast back), so a globally-ordered monotone watermark
    can be computed with no single-partition window. Rows in partitions
    before the first non-null value get a null offset, exactly like a
    window max over an empty preceding frame."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(rank_partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    maxima = {
        r["_pid"]: r["m"]
        for r in ranged.groupBy("_pid")
        .agg(F.max(value_col).cast("long").alias("m"))
        .collect()
    }
    run, offs = None, []
    for pid in range(rank_partitions):
        offs.append((pid, run))
        m = maxima.get(pid)
        if m is not None and (run is None or m > run):
            run = int(m)
    off_df = ranged.sparkSession.createDataFrame(offs, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = list(df.columns)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .select(
            *keep,
            # greatest() skips nulls, so a null offset (no earlier
            # partition had values) falls through to the local max
            F.greatest(F.col("_off"), F.max(value_col).over(w).cast("long"))
            .cast("long")
            .alias(out_col),
        )
    )
