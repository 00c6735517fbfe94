"""Streaming conformal-coverage monitor: does the deployed gate's
split-conformal guarantee actually HOLD on the live feed?

`conformal_gate_threshold` calibrates t4 so a fresh positive document
scores >= t4 with probability >= 90% (finite-sample, distribution-free).
That guarantee is only as good as exchangeability — a drifted feed
silently voids it. This monitor is the deploy-time check: freeze the
trained model (65 integers) and the calibrated threshold BEFORE the
stream starts, score every micro-batch with the frozen literal-map
model (featurize + one codegen fold — no training, no cross-batch
joins), and land a 1-row coverage partial per batch through the
idempotent sink. The finalize step aggregates the partials into the
realized coverage/pass rates and raises the alert flag when realized
coverage undercuts the 90% promise — the retrain/recalibrate trigger,
the conformal sibling of `drift_monitor.py`'s PSI alarm.

Streams clean for the same reason the gate and the PSI monitor do:
all cross-batch state is FROZEN (model + threshold) or additive
(1-row count partials), so the registered RESULT is independent of
micro-batch boundaries — which is what makes a full DuckDB oracle
possible: batch SQL restates training, scoring, the order-statistic
threshold and the coverage aggregation, and the hash match IS the
batch==stream proof (third fully oracle-checked streaming op, after
`quality_gate.py` and `drift_monitor.py`).

At 100 TB the shape holds: sink state is O(batches) 1-row partials
whatever the feed size; per-batch work is one batch-local
featurize+score pass (the L1-unit hashed-TF-IDF features shuffle only
within the batch).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .sinks import write_batch_idempotent
from .windows import stream_from_parquet

__all__ = [
    "frozen_featurizer_state",
    "batch_coverage_counts",
    "conformal_coverage_stream",
    "LAST_TIMINGS",
]

#: realized-coverage alarm line, micro units — the 1 - alpha = 90%
#: marginal guarantee the split-conformal threshold promises.
COVERAGE_TARGET_MICRO = 900_000

#: wall-clock split of the LAST conformal_coverage_stream run —
#: bench.py reads this through _SPLIT_PROVIDERS so the fixed stream
#: machinery cost (checkpoint + query startup) is itemized apart from
#: the steady per-batch scoring drain:
#:   stream_startup_s   .start() -> first foreachBatch invocation
#:   stream_drain_s     first batch -> stream termination
LAST_TIMINGS: dict[str, float] = {}


def frozen_featurizer_state(
    ref_docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
):
    """(df_table persisted+frozen, n_ref): the train-time featurizer
    state the monitor ships with the model — `quality_gate.py`'s
    `frozen_featurizer` (corpus-level token document frequencies; a
    micro-batch scored with batch-local IDF computes a DIFFERENT
    featurization than training did — the classic train/serve skew),
    additionally persisted and counted HERE so the frozen state
    materializes once before the stream starts instead of re-running
    the reference tokenize pass inside every batch."""
    from ..pipeline.dedup import _persist
    from .quality_gate import frozen_featurizer

    dfr, n_ref = frozen_featurizer(ref_docs, text_col, id_col)
    dfr = _persist(dfr)
    dfr.count()  # freeze BEFORE the stream starts (train-time state)
    return dfr, n_ref


def batch_coverage_counts(
    docs: DataFrame,
    dfr: DataFrame,
    n_ref: int,
    w: dict[int, int],
    bias: int,
    t4: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """ONE coverage partial for a batch of raw documents: (n, n_pass,
    n_pos, n_pos_covered) under the frozen featurizer
    (`quality_gate.featurize_with` — broadcast-if-small df table, no
    batch-local corpus statistics; out-of-vocabulary tokens drop out,
    the standard frozen-serving rule), frozen model (literal map
    riding the projection) and frozen conformal threshold. One
    batch-local featurize+score pass + one map-side-combinable
    aggregate; every column is additive across batches by
    construction."""
    from ..pipeline import classifier as CL
    from .quality_gate import featurize_with

    feats = featurize_with(docs, dfr, n_ref, dim, text_col, id_col)
    labels = docs.select(
        F.col(id_col).alias("id"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    scored = CL._score_p4(CL.doc_feature_frame(feats, labels), w, bias)
    passed = F.col("p4") >= F.lit(int(t4))
    return scored.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum(F.when(passed, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_pass"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(
            F.sum(F.when((F.col("y") == 1) & passed, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_pos_covered"),
    )


def conformal_coverage_stream(
    spark: SparkSession,
    dfr: DataFrame,
    n_ref: int,
    w: dict[int, int],
    bias: int,
    t4: int,
    feed_dir: str,
    base_dir: str,
    max_files: int = 2,
    timeout_sec: int = 300,
) -> DataFrame:
    """Stream the parquet feed at ``feed_dir`` (availableNow,
    checkpointed) through the frozen-model conformal gate, landing one
    1-row coverage partial per micro-batch via the idempotent sink
    under ``base_dir``; then finalize: sum the partials and report the
    realized coverage/pass rates (round-half-up micro integers, the
    house division idiom) plus the under-coverage alert. Blocks until
    the stream drains; raises on timeout."""
    out_dir = os.path.join(base_dir, "counts")
    ckpt = os.path.join(base_dir, "ckpt")
    schema = spark.read.parquet(feed_dir).schema
    src = stream_from_parquet(spark, feed_dir, schema, max_files=max_files)

    LAST_TIMINGS.clear()

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if "stream_startup_s" not in LAST_TIMINGS:
            LAST_TIMINGS["stream_startup_s"] = round(
                time.perf_counter() - t_stream0, 3
            )
        write_batch_idempotent(
            batch_coverage_counts(batch_df, dfr, n_ref, w, bias, t4),
            batch_id,
            out_dir,
        )

    t_stream0 = time.perf_counter()
    sq = (
        src.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", ckpt)
        .queryName("conformal_coverage")
        .trigger(availableNow=True)
        .start()
    )
    if not sq.awaitTermination(timeout_sec):
        sq.stop()
        raise TimeoutError(
            "conformal coverage stream did not finish in time"
        )
    LAST_TIMINGS["stream_drain_s"] = round(
        time.perf_counter()
        - t_stream0
        - LAST_TIMINGS.get("stream_startup_s", 0.0),
        3,
    )
    tot = spark.read.parquet(out_dir).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_feed"),
        F.coalesce(F.sum("n_pass"), F.lit(0))
        .cast("long")
        .alias("n_feed_pass"),
        F.coalesce(F.sum("n_pos"), F.lit(0))
        .cast("long")
        .alias("n_feed_pos"),
        F.coalesce(F.sum("n_pos_covered"), F.lit(0))
        .cast("long")
        .alias("n_feed_pos_covered"),
    )
    d2m = "CAST(2000000 AS DECIMAL(38,0))"
    d2 = "CAST(2 AS DECIMAL(38,0))"
    return tot.select(
        F.lit(int(t4)).cast("long").alias("t4"),
        "n_feed",
        "n_feed_pass",
        "n_feed_pos",
        "n_feed_pos_covered",
        F.expr(
            f"CASE WHEN n_feed_pos = 0 THEN 0 ELSE"
            f" ({d2m} * n_feed_pos_covered + n_feed_pos)"
            f" div ({d2} * n_feed_pos) END"
        )
        .cast("long")
        .alias("coverage_micro"),
        F.expr(
            f"CASE WHEN n_feed = 0 THEN 0 ELSE"
            f" ({d2m} * n_feed_pass + n_feed)"
            f" div ({d2} * n_feed) END"
        )
        .cast("long")
        .alias("pass_rate_micro"),
    ).select(
        "*",
        F.when(
            (F.col("n_feed_pos") > 0)
            & (F.col("coverage_micro") < COVERAGE_TARGET_MICRO),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("alert_low_coverage"),
    )
