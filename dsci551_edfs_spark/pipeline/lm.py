"""Count-based n-gram language model: distributed training + per-document
perplexity scoring — the CCNet-style LM quality signal (docs with
outlier perplexity under an in-domain LM are dropped or down-weighted).

Training is two shuffles of small keys (bigram counts, then unigram
context counts joined back); scoring is one broadcast join of the model
table against the corpus bigram explode. Nothing touches Python.

FP policy (same trick as pipeline/importance.py): every per-bigram log
probability is rounded to integer MICRO-NATS (round(ln(p)·1e6) as int64)
before the per-doc reduction, so document scores are exact integer sums —
no accumulation-order dependence — and the DuckDB oracle restates the
identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["bigram_lm", "doc_perplexity", "OOV_LOGP_MICRO"]

# fixed floor for bigrams unseen in training: ln(1e-6) in micro-nats
OOV_LOGP_MICRO = -13_815_511


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — adjacent token pairs per document, order-free
    multiset (position is irrelevant to the score)."""
    toks = tokens(F.col(text_col))
    grams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    grams = F.slice(grams, 1, F.greatest(F.size(toks) - 1, F.lit(1)))
    ex = df.select(
        F.col(id_col), F.explode(grams).alias("g")
    ).select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    return ex.filter(F.col("w2").isNotNull())


def bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the bigram table: ``(w1, w2, cnt, ctx_cnt, logp_micro)`` with
    p(w2|w1) = cnt / ctx_cnt (MLE, no smoothing — unseen pairs take the
    OOV floor at scoring time) and logp_micro = round(ln(p)·1e6).

    Both aggregations are map-side-combinable counts on tiny keys; the
    context join is bigram-vocab-sized, never corpus-sized."""
    bg = _doc_bigrams(df, text_col, id_col)
    pair_cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    ctx_cnt = bg.groupBy("w1").agg(F.count("*").alias("ctx_cnt"))
    return pair_cnt.join(ctx_cnt, "w1").select(
        "w1",
        "w2",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("ctx_cnt").cast("long").alias("ctx_cnt"),
        F.round(F.log(F.col("cnt") / F.col("ctx_cnt")) * 1e6)
        .cast("long")
        .alias("logp_micro"),
    )


def doc_perplexity(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp_micro: int = OOV_LOGP_MICRO,
) -> DataFrame:
    """Score every document under a `bigram_lm` table:
    ``(id, n_bigrams, avg_neg_logp, ppl)`` where avg_neg_logp =
    -Σ logp_micro / n / 1e6 (exact integer sum) and ppl = exp(avg),
    both rounded. Unseen bigrams take the fixed OOV floor.

    The model table broadcasts (a bigram LM over a trillion-token corpus
    prunes to the top few million rows in practice — still broadcast
    range); the corpus side stays a map-only explode."""
    bg = _doc_bigrams(df, text_col, id_col)
    scored = bg.join(
        F.broadcast(lm.select("w1", "w2", "logp_micro")), ["w1", "w2"], "left"
    ).select(
        id_col,
        F.coalesce("logp_micro", F.lit(oov_logp_micro)).alias("lp"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").alias("_micro"),
    )
    avg_neg = -F.col("_micro") / 1e6 / F.col("n_bigrams")
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        F.round(avg_neg, 6).alias("avg_neg_logp"),
        F.round(F.exp(F.round(avg_neg, 6)), 3).alias("ppl"),
    )
