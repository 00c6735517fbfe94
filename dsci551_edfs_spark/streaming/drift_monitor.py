"""Streaming drift monitor: PSI of the LIVE feed's quality-score
distribution against the frozen training-time reference — the
deploy-time companion to the quality gate (`quality_gate.py`): the
gate asks "is this document good?", the monitor asks "has the feed
stopped looking like what we trained on?" — the retrain trigger every
production crawl pipeline runs (CCNet/fastText deployments monitor
exactly this before trusting a frozen classifier on a new slice).

Streams clean for the same reason the gate does — the reference
histogram is FROZEN state and each micro-batch's contribution is a
map-side-combinable per-bin count:
- per batch, ONE codegen scoring projection (`quality_score_model`'s
  frozen linear logit — no training, no joins) into a ≤10-key count,
  landed through the idempotent batch sink (replay-safe);
- the registered RESULT aggregates the per-batch partials AFTER the
  drain, so it is independent of how files landed in micro-batches —
  which is what makes a full DuckDB oracle possible for a streaming
  op (the gate precedent: restate the whole thing in batch SQL, the
  hash match IS the batch==stream proof);
- PSI follows `psi_drift_sources`' exactness discipline: Laplace +1
  over the completed decile grid, each term frozen to integer
  micro-nats by one fixed IEEE expression both engines evaluate
  identically.

At 100 TB the same shape holds: the sink accumulates O(batches × 10)
rows whatever the feed size, and the finalize step reads only those.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import quality_score_model
from .sinks import write_batch_idempotent
from .windows import stream_from_parquet

__all__ = ["decile_counts", "psi_from_counts", "drift_psi_stream"]


def decile_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(bin, cnt): decile histogram of the rule quality score — the
    frozen, SQL-restatable scorer (`quality_score_model`), one codegen
    projection + a ≤10-key map-side-combinable count."""
    return (
        quality_score_model(docs, text_col, id_col)
        .select(
            F.least(
                F.floor(F.col("quality_prob") * 10).cast("long"), F.lit(9)
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def psi_from_counts(ref: DataFrame, feed: DataFrame) -> DataFrame:
    """(bin, cnt_ref, cnt_feed, psi_term_micro) over the completed
    0..9 grid, Laplace +1 smoothing, integer-micro frozen terms —
    identical arithmetic to `psi_drift_sources` so the oracle
    restates it verbatim. Total PSI = Σ terms / 1e6."""
    spark = ref.sparkSession
    grid = spark.range(10).select(F.col("id").alias("bin"))
    s = (
        grid.join(ref.withColumnRenamed("cnt", "cr"), "bin", "left")
        .join(feed.withColumnRenamed("cnt", "cf"), "bin", "left")
        .select(
            "bin",
            (F.coalesce(F.col("cr"), F.lit(0)) + 1).alias("c1r"),
            (F.coalesce(F.col("cf"), F.lit(0)) + 1).alias("c1f"),
        )
    )
    t = s.agg(
        F.sum("c1r").alias("tr"), F.sum("c1f").alias("tf")
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "bin",
        "c1r",
        "c1f",
        (F.col("c1r").cast("double") / F.col("tr")).alias("pr"),
        (F.col("c1f").cast("double") / F.col("tf")).alias("pf"),
    )
    return p.select(
        "bin",
        (F.col("c1r") - 1).cast("long").alias("cnt_ref"),
        (F.col("c1f") - 1).cast("long").alias("cnt_feed"),
        F.round(
            (F.col("pr") - F.col("pf"))
            * F.log(F.col("pr") / F.col("pf"))
            * 1e6
        )
        .cast("long")
        .alias("psi_term_micro"),
    )


def drift_psi_stream(
    spark: SparkSession,
    ref_docs: DataFrame,
    feed_dir: str,
    base_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files: int = 2,
    timeout_sec: int = 300,
) -> DataFrame:
    """Freeze the reference decile histogram on ``ref_docs``, stream the
    parquet feed at ``feed_dir`` through a per-batch decile count
    (availableNow, checkpointed, idempotent sink under ``base_dir``),
    then finalize: aggregate the per-batch partials and report the
    PSI table against the frozen reference. Blocks until the stream
    drains; raises on timeout."""
    from ..pipeline.dedup import _persist

    ref = _persist(decile_counts(ref_docs, text_col, id_col))
    ref.count()  # freeze BEFORE the stream starts (deploy-time state)

    out_dir = os.path.join(base_dir, "bins")
    ckpt = os.path.join(base_dir, "ckpt")
    schema = spark.read.parquet(feed_dir).schema
    src = stream_from_parquet(spark, feed_dir, schema, max_files=max_files)

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(
            decile_counts(batch_df, text_col, id_col), batch_id, out_dir
        )

    sq = (
        src.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", ckpt)
        .queryName("drift_psi")
        .trigger(availableNow=True)
        .start()
    )
    if not sq.awaitTermination(timeout_sec):
        sq.stop()
        raise TimeoutError("drift monitor stream did not finish in time")
    feed = (
        spark.read.parquet(out_dir)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return psi_from_counts(ref, feed)
