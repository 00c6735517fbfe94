"""DSIR-style importance scoring for data selection.

Data Selection via Importance Resampling (Xie et al., 2023) scores every
raw document by how much more likely its hashed n-gram bag is under a
TARGET distribution (a small high-quality corpus) than under the RAW
distribution, then resamples by that weight. The reference engine has no
analogue; this is the selection stage a pretraining pipeline runs after
dedup and before mixture weighting.

Decomposition here (everything a JVM expression, zero Python):

1. ``hashed_grams``: unigram + bigram arrays, each gram hashed to one of
   ``buckets`` ids via the same md5-nibble formula as
   ``curation.md5_bucket`` — deterministic across engines, partitionings
   and runs, and restatable in the DuckDB oracle.
2. ``bucket_distribution``: corpus-wide bucket counts — one
   explode + groupBy(bucket), shuffling (int, long) pairs only.
3. ``dsir_log_weights``: the per-bucket log-likelihood ratio
   ``ln p_target(b) - ln p_raw(b)`` with add-alpha smoothing, computed by
   joining the two B-row distributions. B is small (default 1024), so
   this frame broadcasts everywhere it is consumed.
4. ``dsir_scores``: per-doc average log-weight over its grams — explode,
   broadcast-join the weight table, one groupBy(doc_id) with map-side
   partial aggregation. Docs with no grams score 0 via the left rejoin.

Scale shape: the only wide exchange is the groupBy(doc_id) whose rows are
(id, double); the weight table is a broadcast; the distributions are
B-row aggregates. Nothing grows with corpus size except the two linear
scans — exactly the DSIR paper's "fit two hashed unigram models, score in
one pass" recipe.

Cross-engine determinism: per-bucket weights are rounded to 6 decimals
(ln() agrees to the last ulp across libms, so the rounded doubles are
bit-identical), then the per-doc reduction sums EXACT INTEGER micro-nats
(``round(w * 1e6)`` as int64) — double accumulation order can shift a
59-term sum by ~1e-15, which is enough to straddle a decimal rounding
boundary (observed on the sf0.01 fixture), while integer sums have no
order dependence at all. The public ``log_weight`` is micro / 1e6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import ngram_array

__all__ = [
    "hashed_grams",
    "bucket_distribution",
    "dsir_log_weights",
    "dsir_scores",
]

DEFAULT_BUCKETS = 1024


def _gram_bucket(gram: Column, buckets: int) -> Column:
    """md5-nibble bucket of a gram string (same formula as
    curation.md5_bucket, which buckets ids)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 4), 16, 10).cast("long") % buckets
    )


def hashed_grams(
    text: Column | str, buckets: int = DEFAULT_BUCKETS
) -> Column:
    """Array of hashed-gram bucket ids: unigrams + bigrams (the DSIR
    feature family), NON-distinct — a doc using a gram twice counts it
    twice, as a bag-of-ngrams likelihood requires."""
    c = F.col(text) if isinstance(text, str) else text
    grams = F.concat(ngram_array(c, 1), ngram_array(c, 2))
    return F.transform(grams, lambda g: _gram_bucket(g, buckets))


def bucket_distribution(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, cnt): corpus-wide hashed-gram counts — the sufficient
    statistic of the DSIR unigram-bag model. At most ``buckets`` rows."""
    return (
        df.select(
            F.explode(hashed_grams(text_col, buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 0.01,
) -> DataFrame:
    """(bucket, w): smoothed per-bucket log-likelihood ratio
    ``ln((t_b + a)/(T + a*B)) - ln((r_b + a)/(R + a*B))`` for every
    bucket 0..B-1 (missing buckets get the pure-smoothing weight). The
    result is a <= B-row frame — broadcast it into the scoring join."""
    spark = target.sparkSession
    t = bucket_distribution(target, text_col, buckets).withColumnRenamed(
        "cnt", "t_cnt"
    )
    r = bucket_distribution(raw, text_col, buckets).withColumnRenamed(
        "cnt", "r_cnt"
    )
    all_b = spark.range(buckets).select(F.col("id").cast("long").alias("bucket"))
    joined = (
        all_b.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    # totals via a window-free cross join of the two 1-row aggregates:
    # B rows total, driver-free, and the whole frame broadcasts onward.
    tot = joined.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    a, ab = float(alpha), float(alpha) * buckets
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("t_cnt") + a) / (F.col("t_tot") + ab))
            - F.log((F.col("r_cnt") + a) / (F.col("r_tot") + ab)),
            6,
        ).alias("w"),
    )


def dsir_scores(
    raw: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-doc DSIR importance: ``(id_col, n_grams, log_weight, score)``
    where ``log_weight`` is the summed bucket weight of the doc's grams
    and ``score`` the per-gram average (length-normalized, the form used
    for ranking). One explode + broadcast weight join + one
    groupBy(id) with partial aggregation."""
    ex = raw.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(hashed_grams(text_col, buckets)).alias("bucket"),
    )
    micro = F.round(F.col("w") * 1e6).cast("long")  # exact int sum
    scored = (
        ex.join(F.broadcast(weights), "bucket", "left")
        .groupBy("_id")
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum(micro), F.lit(0)).alias("_micro"),
        )
    )
    return scored.select(
        F.col("_id").alias(id_col),
        F.col("n_grams").cast("long").alias("n_grams"),
        (F.col("_micro") / 1e6).alias("log_weight"),
        F.round(
            (F.col("_micro") / 1e6) / F.greatest("n_grams", F.lit(1)), 6
        ).alias("score"),
    )
