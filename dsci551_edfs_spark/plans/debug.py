"""Plan inspection & the reference's `debug` explanation channel.

The reference's `debug=true` attaches per-partition {Partition, Input,
Output} traces (`combined_flask.py:712-717`, `:771-772`). Spark-native
equivalents:
- `explain_str(df)` — the formatted physical plan (check for
  PushedFilters / ReadSchema / WholeStageCodegen spans).
- `partition_trace(df, aggs)` — one row per physical partition via
  `spark_partition_id()`.
- `observed(df, name, *exprs)` — `df.observe` metrics that surface on the
  driver after an action without a second scan.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["explain_str", "partition_trace", "observed", "plan_has"]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_has(df: DataFrame, needle: str, mode: str = "formatted") -> bool:
    """Assert helper: does the physical plan mention `needle`
    (e.g. 'PushedFilters', 'BroadcastHashJoin', 'PartitionFilters')?"""
    return needle in explain_str(df, mode)


def partition_trace(df: DataFrame, *aggs: Column) -> DataFrame:
    """Per-physical-partition partials — the `debug` channel as ONE extra
    aggregate instead of the reference's per-process re-reads."""
    if not aggs:
        aggs = (F.count("*").alias("size"),)
    return (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(*aggs)
        .orderBy("partition")
    )


def observed(df: DataFrame, name: str, *exprs: Column) -> DataFrame:
    """Attach observation metrics (collected free-of-charge with the next
    action; read via QueryExecutionListener or `df.observe` semantics)."""
    return df.observe(name, *exprs)
