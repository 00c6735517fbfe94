"""Scans over EDFS tables: `cat`, `readPartition`, `getPartitionLocations`.

Reference semantics:
- `cat?path` reassembles all blocks, restores ingest row order via the
  injected ``index`` column, drops it, emits CSV
  (`combined_flask.py:270-322`; Firebase dedups the two replicas,
  `combined_flask.py:1118`).
- `readPartition?path&partition` returns one partition's rows
  (`combined_flask.py:492-547`).
- `getPartitionLocations?path` returns the partition map
  (`combined_flask.py:438-490`).

Spark design: a `cat` is an order-restoring parquet scan; a `readPartition`
is a **partition-pruned** scan (filter on the Hive partition column reaches
the DataSource and prunes directories — no data read outside the target
partition); `getPartitionLocations` is a metadata aggregate over the
partition column. Replica failover is the storage layer's job and is not
re-implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import INDEX_COL, PARTITION_COL

__all__ = ["cat", "read_partition", "get_partition_locations", "list_partitions"]


def _read(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def cat(spark: SparkSession, path: str) -> DataFrame:
    """Full scan with ingest-order restoration (`combined_flask.py:313-314`).

    ``monotonically_increasing_id`` is monotone in ingest order, so sorting
    by it restores the original row order; the column is then dropped, as the
    reference drops ``index``. The sort is a global order-by — at scale,
    callers that don't need a total order should skip `cat` and scan
    directly.
    """
    df = _read(spark, path)
    drop = [c for c in (INDEX_COL, PARTITION_COL) if c in df.columns]
    if INDEX_COL in df.columns:
        df = df.orderBy(INDEX_COL)
    return df.drop(*drop)


def list_partitions(spark: SparkSession, path: str) -> list[str]:
    """Sorted distinct partition-key values (a metadata-only scan: only the
    partition column is read, which for a Hive layout is directory names)."""
    df = _read(spark, path)
    if PARTITION_COL not in df.columns:
        return []
    rows = df.select(PARTITION_COL).distinct().collect()
    return sorted(r[0] for r in rows)


def read_partition(spark: SparkSession, path: str, partition: int) -> DataFrame:
    """1-indexed single-partition read (`combined_flask.py:492-547`).

    Partition numbering = 1-based index into the sorted distinct partition
    keys (the reference numbers blocks by ingest ``order``/``offset``; with a
    Hive layout the key itself is the stable identity). The filter on the
    partition column is pushed down → Catalyst prunes to one directory.
    """
    keys = list_partitions(spark, path)
    if not 1 <= partition <= len(keys):
        raise IndexError(f"partition {partition} out of range 1..{len(keys)}")
    key = keys[partition - 1]
    df = _read(spark, path).filter(F.col(PARTITION_COL) == key)
    if INDEX_COL in df.columns:
        df = df.orderBy(INDEX_COL)
    return df.drop(PARTITION_COL, INDEX_COL)


def get_partition_locations(spark: SparkSession, path: str) -> dict:
    """Partition map: {partition# → {key, rows, files}}.

    The reference returns {replica → {partition# → {datanode → block_id}}}
    (`combined_flask.py:477-487`); replica/datanode placement belongs to the
    storage layer here, so the map reports the partition key, row count and
    backing file count instead — the information a query planner actually
    uses.
    """
    df = _read(spark, path)
    if PARTITION_COL not in df.columns:
        n = df.rdd.getNumPartitions()
        return {"partitions": {i + 1: {"key": None} for i in range(n)}}
    counts = (
        df.groupBy(PARTITION_COL)
        .agg(F.count("*").alias("rows"))
        .orderBy(PARTITION_COL)
        .collect()
    )
    return {
        "partitions": {
            i + 1: {"key": r[PARTITION_COL], "rows": r["rows"]}
            for i, r in enumerate(counts)
        }
    }
