"""Benchmark decontamination for training corpora.

The reference (`Aman04jdsj/dsci551_EDFS`) has no analogue — it is an EDFS +
partition-map-reduce system (`combined_flask.py`) with no corpus hygiene
layer; this module is part of the beyond-reference training-data-pipeline
surface the engine is required to provide.

Semantics follow the published GPT-3/PaLM-style recipe: a training document
is *contaminated* if it shares at least ``min_overlap`` distinct word
n-grams with any document in a held-out benchmark/eval set. Removal is an
anti-join on the flagged ids.

Scale shape (100 TB corpus vs MB–GB benchmark):

- The benchmark side is reduced to its DISTINCT n-gram hash set (8-byte
  xxhash64 keys, no text) and **broadcast** by default — benchmark suites
  are orders of magnitude smaller than the corpus, so the corpus-side scan
  joins against an in-memory hash set with zero shuffle of corpus data.
- The corpus side ships only ``(id, ngram_hash)`` posting rows into the
  join; document text never crosses the wire.
- With ``broadcast_bench=False`` the same plan degrades gracefully to a
  shuffle hash join on the 8-byte key for pathological benchmark sizes.
- Overlap counting is a map-side-combinable ``groupBy(id).count()``; the
  final stats frame is one row per corpus doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _persist, shingle_df

__all__ = ["ngram_overlap_contamination", "decontaminate", "decontam_gate"]


def _posting(train: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gh): one exploded 8-byte gram-hash row per distinct doc gram."""
    return (
        shingle_df(train, text_col, id_col, n)
        .select("id", F.explode("shingles").alias("sh"))
        .select("id", F.xxhash64("sh").alias("gh"))
    )


def _overlap_hits(
    posting: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    broadcast_bench: bool,
) -> DataFrame:
    """(id, overlap_ngrams) for train docs with >= 1 shared n-gram.
    ``posting`` is an (id, gh) gram-hash posting frame (from ``_posting``).
    Shingles are distinct per doc (shingle_df array_distinct), so a plain
    count after the join is the distinct-overlap count."""
    bench_grams = (
        shingle_df(bench, text_col, id_col, n)
        .select(F.explode("shingles").alias("sh"))
        .select(F.xxhash64("sh").alias("gh"))
        .distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)

    return (
        posting.join(bench_grams, "gh")
        .groupBy("id")
        .agg(F.count("*").alias("overlap_ngrams"))
    )


def ngram_overlap_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-training-doc benchmark-overlap stats.

    Returns ``(id_col, n_ngrams, overlap_ngrams, overlap_frac,
    contaminated)`` — one row per ``train`` doc. ``n_ngrams`` is the doc's
    distinct n-gram count, ``overlap_ngrams`` how many of those also occur
    anywhere in ``bench``, ``contaminated`` whether that count reaches
    ``min_overlap``.
    """
    # One shingle pass: the persisted (id, gh) posting frame feeds BOTH
    # the per-doc distinct-gram count (shingles are distinct, so a plain
    # map-side-combinable count == size(shingles)) and the overlap join —
    # without it, sizes and hits would each re-run tokenize+ngram+explode
    # over the full corpus. Registered for dedup.release_cached().
    posting = _persist(_posting(train, text_col, id_col, n))
    sizes = posting.groupBy("id").agg(F.count("*").alias("n_ngrams"))
    hits = _overlap_hits(posting, bench, text_col, id_col, n, broadcast_bench)
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_ngrams",
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            F.round(
                F.coalesce("overlap_ngrams", F.lit(0))
                / F.col("n_ngrams").cast("double"),
                6,
            ).alias("overlap_frac"),
            (F.coalesce("overlap_ngrams", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop contaminated docs from ``train``; rows pass through otherwise
    untouched (anti-join on the flagged id set, no text shuffled).

    Only the hit counts are computed — not the full per-doc stats frame —
    so the removal path skips the shingle-size projection and its join."""
    flagged = (
        _overlap_hits(
            _posting(train, text_col, id_col, n),
            bench,
            text_col,
            id_col,
            n,
            broadcast_bench,
        )
        .filter(F.col("overlap_ngrams") >= min_overlap)
        .select(F.col("id").alias(id_col))
    )
    return train.join(flagged, id_col, "left_anti")


def decontam_gate(
    docs: DataFrame, flagged: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Enforce an OFFLINE-computed contamination list on a document feed —
    batch or streaming. ``flagged`` is the (small) id list produced by
    ``ngram_overlap_contamination`` over the historical corpus; ``docs``
    may be a Structured Streaming frame, in which case this is a
    stateless stream-static left_anti join (re-planned and broadcast per
    micro-batch, zero streaming state) — the production enforcement
    shape: the expensive overlap scan runs offline on the cluster, the
    ingest stream only pays a broadcast-hash probe per row. Batch and
    streaming runs of this function are row-identical (pinned in
    tests/test_streaming.py)."""
    return docs.join(
        F.broadcast(flagged.select(id_col).distinct()), id_col, "left_anti"
    )
