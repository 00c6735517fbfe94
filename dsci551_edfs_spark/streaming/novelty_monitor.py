"""Streaming n-gram novelty monitor: is the live crawl still bringing
NEW text, or just recombining what the corpus already has?

`vocab_growth_curve` asks this of the settled corpus at the unigram
level; this is the deploy-time version at the 3-gram level — the
ingest-or-stop signal for a crawl feed, and the same novel-n-gram
metric the memorization literature uses (a feed whose 3-grams are all
already in the corpus adds recombination, not content; unigrams are
too coarse — a saturated vocabulary can still produce novel text).

The reference corpus's 3-gram vocabulary is FROZEN before the stream
starts (persisted + counted — the drift monitor's frozen-histogram /
conformal monitor's frozen-df-table discipline); each micro-batch
builds its own 3-grams, anti-joins the frozen set, and lands its
(gram, count) NOVEL partials plus a 1-row occurrence census through
the idempotent sink. The finalize step dedups novel grams ACROSS
batches (the same new gram arriving in two batches is ONE novel type —
per-batch scalars would double-count, which is why the sink keeps
per-gram rows) and reports type/occurrence novelty in exact ppm.

Fourth fully oracle-checked streaming op: all cross-batch state is
frozen (the gram set) or union-merged rows keyed by gram, so the
registered RESULT is independent of micro-batch boundaries and batch
SQL restates it exactly — the hash match IS the batch==stream proof.

At 100 TB: sink state is O(novel grams) + O(batches) rows — gram-
vocabulary-sized, never corpus-sized; per-batch work is one gram
projection + one anti-join against the frozen set (broadcast when it
fits, key-shuffled otherwise — `broadcast_if_small`).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.text import tokens
from .sinks import write_batch_idempotent
from .windows import stream_from_parquet

__all__ = ["doc_grams", "frozen_gram_vocab", "batch_novelty",
           "gram_novelty_stream"]

#: n-gram order of the novelty vocabulary.
GRAM_N = 3


def doc_grams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram): one row per 3-gram occurrence, ' '-joined, over the
    whitespace tokens of each non-empty doc. One codegen projection +
    explode — 0-based Spark array indexing, guarded so docs shorter
    than n produce nothing (sequence() would go DESCENDING on a
    negative stop, not empty)."""
    grams = F.when(
        F.size(F.col("_ts")) >= GRAM_N,
        F.expr(
            "transform(sequence(0, size(_ts) - 3),"
            " i -> concat_ws(' ', _ts[i], _ts[i+1], _ts[i+2]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(tokens(F.col(text_col)).alias("_ts"))
        .select(F.explode(grams).alias("gram"))
    )


def frozen_gram_vocab(
    ref_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(gram): the reference corpus's distinct 3-gram set, persisted
    and counted so it freezes BEFORE the stream starts — train-time
    state, gram-vocabulary-sized."""
    from ..pipeline.dedup import _persist

    v = _persist(doc_grams(ref_docs, text_col).distinct())
    v.count()
    return v


def batch_novelty(
    docs: DataFrame, vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Novelty partials for one batch: (gram, cnt) rows for every
    occurrence of a 3-gram OUTSIDE the frozen set, plus one census row
    (gram = NULL) carrying the batch's TOTAL gram-occurrence count.
    Union-keyed by gram, so the finalize dedup/sum is batch-boundary
    independent.

    One pass (optimization r14, guide §1.2): ``cube("gram")`` over a
    single column is exactly grouping sets ((gram), ()) — the per-gram
    counts AND the grand-total census row (gram = NULL, Spark's cube
    marker) from ONE tokenize + ONE aggregation, where the previous
    novel/total union evaluated `doc_grams` twice per micro-batch. The
    anti-join then drops in-vocab gram rows and keeps the census row
    (a NULL key never matches, and real grams are never NULL —
    concat_ws output), so the emitted rows are value-identical."""
    from ..plans.hints import broadcast_if_small

    g = doc_grams(docs, text_col)
    all_plus_total = g.cube("gram").agg(
        F.count("*").cast("long").alias("cnt")
    )
    return all_plus_total.join(broadcast_if_small(vocab), "gram", "left_anti")


def gram_novelty_stream(
    spark: SparkSession,
    vocab: DataFrame,
    feed_dir: str,
    base_dir: str,
    max_files: int = 2,
    timeout_sec: int = 300,
) -> DataFrame:
    """Stream the parquet feed through the per-batch novelty count
    (availableNow, checkpointed, idempotent sink), then finalize:
    distinct novel 3-gram types across ALL batches, their total
    occurrences, the feed's total gram occurrences, and the novelty
    rates in exact ppm. Blocks until the stream drains; raises on
    timeout."""
    out_dir = os.path.join(base_dir, "novel")
    ckpt = os.path.join(base_dir, "ckpt")
    schema = spark.read.parquet(feed_dir).schema
    src = stream_from_parquet(spark, feed_dir, schema, max_files=max_files)

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_idempotent(
            batch_novelty(batch_df, vocab), batch_id, out_dir
        )

    sq = (
        src.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", ckpt)
        .queryName("gram_novelty")
        .trigger(availableNow=True)
        .start()
    )
    if not sq.awaitTermination(timeout_sec):
        sq.stop()
        raise TimeoutError("gram novelty stream did not finish in time")
    parts = spark.read.parquet(out_dir)
    agg = parts.agg(
        F.countDistinct(F.col("gram")).cast("long").alias("n_new_grams"),
        F.coalesce(
            F.sum(F.when(F.col("gram").isNotNull(), F.col("cnt"))),
            F.lit(0),
        )
        .cast("long")
        .alias("new_occurrences"),
        F.coalesce(
            F.sum(F.when(F.col("gram").isNull(), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("feed_occurrences"),
    )
    return agg.select(
        "n_new_grams",
        "new_occurrences",
        "feed_occurrences",
        F.expr(
            "CASE WHEN feed_occurrences = 0 THEN 0"
            " ELSE new_occurrences * 1000000 div feed_occurrences END"
        )
        .cast("long")
        .alias("novelty_ppm"),
    )
