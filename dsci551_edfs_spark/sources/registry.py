"""Table registry: load the driver-generated parquet tables for an sf dir.

The reference's only "catalog" was an inode tree (`combined_flask.py:44-47`);
here the catalog is simply the parquet directory plus ``spark.catalog`` temp
views. Column pruning + predicate pushdown are free because every load is a
plain parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

__all__ = ["TABLES", "load_table", "register_all"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Plain `spark.read.parquet` so Catalyst sees a
    pushdown-capable DataSource scan (PushedFilters / ReadSchema).

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects; we read it via the nanosAsLong legacy mode and convert
    to TimestampType (microsecond floor) — a zero-copy long→timestamp cast
    inside codegen, applied only for that table."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Timestamp semantics must not depend on who built the SparkSession
    # (the verification driver may hand us a vanilla one): pin UTC so
    # year()/window() match the oracle's naive-timestamp arithmetic.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name != "events":
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: ns epochs (~1.7e18) exceed double's 2^53
        # mantissa, so `/ 1000` + floor would corrupt the low microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # parquet timestamp[us] with isAdjustedToUTC=false reads as
        # TIMESTAMP_NTZ, which streaming watermarks and epoch casts reject;
        # session TZ is pinned UTC above, so NTZ→LTZ keeps the same instant
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for spark.sql queries) and
    return the DataFrames keyed by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
