"""Streaming NEAR-duplicate ingest gate: a document feed replayed through
``foreachBatch`` where each micro-batch is deduped against the corpus
accumulated so far — the continuous face of
``pipeline/dedup.incremental_minhash_dedup``, the way a crawl pipeline
actually runs it:

    corpus_v0 = seed corpus
    for each micro-batch B (checkpointed, at-least-once):
        survivors = incremental_minhash_dedup(B, corpus_v{n})
        corpus_v{n+1} = corpus_v{n} ∪ survivors
    final = corpus_v{N}

Semantics:
- A shard doc near-dup (Jaccard ≥ threshold) of ANY earlier-ingested doc
  — seed or a survivor of an earlier batch — is dropped; within one
  batch the min id survives. Order therefore matters exactly as it does
  in a real rolling crawl: earlier content wins.
- Versioned corpus directories make replays safe: re-running batch N
  rewrites v{n+1} from the same v{n} — idempotent by construction, the
  same recipe as streaming/cdc.py.

Scale notes: at 100 TB the corpus side of each batch's join is the
banded SIGNATURE INDEX, not corpus text (incremental_minhash_dedup ships
(id, band, bh) rows; text is reread only to verify the candidate
sliver). A deployment materializes the signature index once and appends
each batch's survivor signatures; the versioned-parquet loop here keeps
the test rig self-contained while exercising the identical per-batch
plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.dedup import incremental_minhash_dedup, release_cached
from .windows import stream_from_parquet

__all__ = ["dedup_ingest_stream"]


def dedup_ingest_stream(
    spark: SparkSession,
    seed_corpus: DataFrame,
    feed_dir: str,
    base_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_files: int = 1,
    timeout_sec: int = 300,
    stream_df: DataFrame | None = None,
) -> DataFrame:
    """Replay the parquet document feed at ``feed_dir`` through the
    near-dup gate against ``seed_corpus`` and return the FINAL corpus
    (seed + all surviving feed docs). Blocks until the availableNow
    stream drains; raises on timeout.

    ``stream_df`` swaps in any other streaming source for the feed —
    e.g. ``spark.readStream.format("edfs")`` over a put layout
    (sources/edfs_datasource.py), which is how a crawl landing in EDFS
    flows straight into the gate; ``feed_dir``/``max_files`` are ignored
    then."""
    if stream_df is None:
        schema = spark.read.parquet(feed_dir).schema
    state = {"v": 0}

    def vdir(n: int) -> str:
        return os.path.join(base_dir, f"corpus_v{n}")

    seed_corpus.select(id_col, text_col).write.mode("overwrite").parquet(vdir(0))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = spark.read.parquet(vdir(state["v"]))
        survivors = incremental_minhash_dedup(
            batch_df.select(id_col, text_col),
            cur,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
        )
        cur.unionByName(survivors).write.mode("overwrite").parquet(
            vdir(state["v"] + 1)
        )
        release_cached()  # the per-batch banded/shingle pins
        state["v"] += 1

    feed = (
        stream_df
        if stream_df is not None
        else stream_from_parquet(spark, feed_dir, schema, max_files=max_files)
    )
    sq = (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not sq.awaitTermination(timeout_sec):
        sq.stop()
        raise TimeoutError(f"dedup ingest did not drain within {timeout_sec}s")
    return spark.read.parquet(vdir(state["v"]))
