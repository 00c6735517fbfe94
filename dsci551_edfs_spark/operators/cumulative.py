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

__all__ = [
    "running_total",
    "running_totals",
    "running_max",
    "derive_rank_partitions",
]

#: Parallelism floor for the range-partitioned prefix stage. Small inputs
#: (score-domain frames, test fixtures) still get full local[32] coverage.
MIN_RANK_PARTITIONS = 32


def derive_rank_partitions(df: DataFrame, rank_partitions: int | None) -> int:
    """Resolve the range-partition count for the two-phase prefix pass.

    ``None`` (the default everywhere) derives it from the session's
    ``spark.sql.shuffle.partitions`` (floor 32) — the knob that is sized
    to ~2-3x total executor cores on a real cluster (session.py
    contract), so a doc-granularity consumer (corpus shuffle order,
    curriculum schedule, CUSUM over a 100 TB event log) keeps the
    cluster's full parallelism while the offset exchange stays one row
    per range partition (KB-scale even at thousands of partitions).

    It was previously derived from ``df.rdd.getNumPartitions()``
    (optimization r13, guide §7.3): that probe pays a full
    Catalyst-plan→RDD conversion per call (~0.4-0.5 s of pure driver
    time on every running_total consumer) and, for the post-shuffle
    frames most consumers pass in, reports the pre-execution AQE
    placeholder (1) rather than anything about the input — all cost, no
    signal. Callers with domain knowledge (e.g. a score-domain-bounded
    frame) may still pass an explicit count.
    """
    if rank_partitions is not None:
        return rank_partitions
    try:
        conf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        conf = MIN_RANK_PARTITIONS
    return max(MIN_RANK_PARTITIONS, conf)


def running_totals(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_cols: Sequence[tuple[str, str]],
    rank_partitions: int | None = None,
) -> DataFrame:
    """Append one running-sum column per ``(value_col, out_col)`` pair,
    all in global ``order_cols`` order, sharing ONE two-phase pass
    (range partition + broadcast per-partition offsets) — so e.g. a
    tie-corrected AUC's cumulative count AND cumulative positives cost
    a single range shuffle, and the plan contains no single-partition
    window at any input size."""
    rank_partitions = derive_rank_partitions(df, rank_partitions)
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(rank_partitions, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r
        for r in ranged.groupBy("_pid")
        .agg(
            *(
                F.sum(v).cast("long").alias(f"_t_{i}")
                for i, (v, _) in enumerate(value_cols)
            )
        )
        .collect()
    }
    accs = [0] * len(value_cols)
    offs = []
    for pid in range(rank_partitions):
        offs.append((pid, *accs))
        row = totals.get(pid)
        if row is not None:
            accs = [
                acc + int(row[f"_t_{i}"] or 0) for i, acc in enumerate(accs)
            ]
    off_schema = "_pid int, " + ", ".join(
        f"_off_{i} long" for i in range(len(value_cols))
    )
    off_df = ranged.sparkSession.createDataFrame(offs, off_schema)
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
            *(
                (F.col(f"_off_{i}") + F.sum(v).over(w))
                .cast("long")
                .alias(out)
                for i, (v, out) in enumerate(value_cols)
            ),
        )
    )


def running_total(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "running_total",
    rank_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = the running sum of ``value_col`` in global
    ``order_cols`` order, computed two-phase (range partition +
    broadcast per-partition offsets) so the plan contains no
    single-partition window at any input size."""
    return running_totals(
        df, order_cols, [(value_col, out_col)], rank_partitions
    )


def running_max(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "running_max",
    rank_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = the running max of ``value_col`` in global
    ``order_cols`` order — same two-phase shape as ``running_total``
    (range partition, per-partition maxima to the driver, prefix-max
    offsets broadcast back), so a globally-ordered monotone watermark
    can be computed with no single-partition window. Rows in partitions
    before the first non-null value get a null offset, exactly like a
    window max over an empty preceding frame."""
    rank_partitions = derive_rank_partitions(df, rank_partitions)
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
