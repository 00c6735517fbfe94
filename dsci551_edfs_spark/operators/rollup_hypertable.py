"""Hypertable rollup — TimescaleDB-style continuous aggregates on Spark.

The reference has no time-series surface at all; this is the brief's
"hypertable rollup" custom operator: a time-bucketed MATERIALIZED
aggregate over an event table, stored partitioned by day so that

- dashboards read the tiny rollup, never the raw hypertable;
- coarser grains (day/week) are RE-AGGREGATED FROM THE ROLLUP — possible
  because only mergeable partials are materialized (sum/count/min/max;
  avg is derived sum/count at query time, never stored);
- time-range predicates prune rollup partitions at the directory level
  (Hive layout on `day`).

Scale notes:
- the materialization is one groupBy((bucket, key)) over the raw table —
  the same shuffle any hourly report would pay once, then never again;
- rollup size = |buckets| x |keys| rows — for a year of hourly x 1e4 keys
  that is ~9e7 rows, parquet-compressed to GBs: re-aggregation to any
  coarser grain is interactive even when the raw table is 100 TB;
- appending a new day of raw data only writes that day's partition
  (`mode=append` + daily job), the continuous-aggregate refresh pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_rollup", "read_rollup", "reaggregate"]

# the mergeable partial set: everything a coarser grain can be rebuilt from
_PARTIALS = ["n_events", "sum_value", "min_value", "max_value"]


def build_rollup(
    events: DataFrame,
    dest: str,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """Materialize the time-bucketed rollup, Hive-partitioned by day.

    Stores ONLY mergeable partials (count/sum/min/max) — never avg —
    so any coarser grain is a further groupBy over the rollup."""
    bucketed = events.groupBy(
        F.window(F.col(ts_col), bucket).start.alias("bucket_start"),
        F.col(key_col).alias("key"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    out = bucketed.withColumn("day", F.to_date("bucket_start"))
    out.repartition("day").write.mode("overwrite").partitionBy("day").parquet(dest)


def read_rollup(
    spark: SparkSession,
    path: str,
    start=None,
    end=None,
) -> DataFrame:
    """Read the rollup; `[start, end)` filters hit the `day` partition
    column first, so out-of-range day directories are never listed."""
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("day") >= F.lit(start).cast("date"))
        df = df.filter(F.col("bucket_start") >= F.lit(start))
    if end is not None:
        df = df.filter(F.col("day") <= F.lit(end).cast("date"))
        df = df.filter(F.col("bucket_start") < F.lit(end))
    return df


def reaggregate(rollup: DataFrame, grain: str = "1 day") -> DataFrame:
    """Roll the materialized partials up to a coarser grain — the raw
    hypertable is never touched. avg is DERIVED (sum/count of merged
    partials), which is exactly why avg itself is never materialized."""
    merged = rollup.groupBy(
        F.window("bucket_start", grain).start.alias("bucket_start"),
        "key",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return merged.withColumn(
        "avg_value", F.col("sum_value") / F.col("n_events")
    )
