"""Streaming CDC apply: a change feed replayed through ``foreachBatch``
into MERGE-INTO semantics — the continuous face of ``operators/merge.py``.

A lakehouse ingests CDC (debezium-style upsert rows) by applying each
micro-batch as a MERGE against the current table version and committing a
NEW version — never rewriting the version a concurrent reader may hold.
That loop is exactly what `apply_changes_stream` runs:

    v0 = initial table
    for each micro-batch B (checkpointed, at-least-once):
        v{n+1} = merge_into(v{n}, B)        # join-and-rewrite
    current = v{N}

Semantics:
- Within a batch, duplicate keys collapse deterministically
  (``dedupe_source`` struct-min) — a real MERGE would raise; CDC apply
  takes the canonical row.
- Across batches, later batches win (last-writer-wins on the key), the
  standard CDC contract. When the whole feed carries unique keys, the
  final table is EQUAL to one single-shot MERGE of the entire feed —
  the batch/stream equivalence the oracle checks.
- Versioned directories make replays safe: a re-run of batch N rewrites
  v{n+1} from the same v{n} input — idempotent by construction, the same
  recipe as streaming/sinks.py but at table rather than append
  granularity.

Scale notes: each batch pays one keyed join of (table ⟗ batch) — with the
table bucketed on the merge key (sources/bucketing.py) the table side
never re-shuffles; the rewrite cost is what Delta/Iceberg MERGE pays
before file pruning, and file-pruned rewrites would drop in at the
`merge_into` call site without touching the loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_into
from .windows import stream_from_parquet

__all__ = ["apply_changes_stream"]


def apply_changes_stream(
    spark: SparkSession,
    target_init: DataFrame,
    feed_dir: str,
    base_dir: str,
    key: str,
    update_cols: list[str] | None = None,
    max_files: int = 1,
    timeout_sec: int = 300,
) -> DataFrame:
    """Replay the parquet change feed at ``feed_dir`` against
    ``target_init`` and return the FINAL table version. Blocks until the
    availableNow stream drains; raises on timeout (never returns a
    half-applied table silently)."""
    schema = spark.read.parquet(feed_dir).schema
    state = {"v": 0}

    def vdir(n: int) -> str:
        return os.path.join(base_dir, f"target_v{n}")

    target_init.write.mode("overwrite").parquet(vdir(0))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = spark.read.parquet(vdir(state["v"]))
        merged = merge_into(
            cur, batch_df, key=key, update_cols=update_cols, dedupe_source=True
        ).drop("_merge_action")
        merged.write.mode("overwrite").parquet(vdir(state["v"] + 1))
        state["v"] += 1

    sq = (
        stream_from_parquet(spark, feed_dir, schema, max_files=max_files)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not sq.awaitTermination(timeout_sec):
        sq.stop()
        raise TimeoutError(f"CDC apply did not drain within {timeout_sec}s")
    return spark.read.parquet(vdir(state["v"]))
