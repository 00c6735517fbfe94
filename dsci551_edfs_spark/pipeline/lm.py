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

__all__ = ["bigram_lm", "doc_perplexity", "trigram_sb_perplexity", "OOV_LOGP_MICRO", "SB_BACKOFF_MICRO"]

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


# round(ln(0.4)·1e6): the Stupid Backoff discount per backoff level
SB_BACKOFF_MICRO = -916_291


def _doc_trigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2, w3) — adjacent token triples per document."""
    toks = tokens(F.col(text_col))
    pair = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    tri = F.zip_with(
        pair,
        F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda p, c: F.struct(
            p["w1"].alias("w1"), p["w2"].alias("w2"), c.alias("w3")
        ),
    )
    tri = F.slice(tri, 1, F.greatest(F.size(toks) - 2, F.lit(1)))
    ex = df.select(F.col(id_col), F.explode(tri).alias("g")).select(
        id_col,
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )
    return ex.filter(F.col("w3").isNotNull() & F.col("w2").isNotNull())


def trigram_sb_perplexity(
    train_df: DataFrame,
    score_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007 — THE
    web-scale n-gram recipe: no normalization, a fixed 0.4 discount per
    backoff level, which is why it scales where Kneser-Ney doesn't):

        S(w3|w1 w2) = c3/c2ctx           if trigram seen
                    = 0.4 · c2/c1ctx     else if bigram seen
                    = 0.4² · c1/total    else if unigram seen
                    = OOV floor          otherwise

    Every branch's log-score is an INTEGER micro-nat (model logs frozen
    at build time, backoff discounts are integer addends), so per-doc
    sums are exact and order-free. Three model tables (trigram, bigram,
    unigram) join the corpus at scoring via size-guarded broadcasts —
    they are corpus-n-gram-cardinality frames, so the hint applies only
    while Catalyst's size estimate fits and otherwise falls back to
    key-shuffled hash joins; the corpus side is one trigram explode.
    Returns
    ``(id, n_trigrams, n_tri_hits, n_bi_backoffs, n_uni_backoffs,
    n_oov, avg_neg_logp, ppl)``."""
    tri = _doc_trigrams(train_df, text_col, id_col)
    bg = _doc_bigrams(train_df, text_col, id_col)
    uni = train_df.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c3"))
    c2ctx = tri.groupBy("w1", "w2").agg(F.count("*").alias("c2ctx"))
    lm3 = c3.join(c2ctx, ["w1", "w2"]).select(
        "w1",
        "w2",
        "w3",
        F.round(F.log(F.col("c3") / F.col("c2ctx")) * 1e6)
        .cast("long")
        .alias("lp3"),
    )
    b2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    b1ctx = bg.groupBy("w1").agg(F.count("*").alias("c1ctx"))
    lm2 = (
        b2.join(b1ctx, "w1")
        .select(
            F.col("w1").alias("w2"),
            F.col("w2").alias("w3"),
            (
                F.round(F.log(F.col("c2") / F.col("c1ctx")) * 1e6).cast(
                    "long"
                )
                + F.lit(SB_BACKOFF_MICRO)
            ).alias("lp2"),
        )
    )
    u1 = uni.groupBy("w").agg(F.count("*").alias("c1"))
    tot = uni.agg(F.count("*").alias("t"))
    lm1 = u1.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("w3"),
        (
            F.round(F.log(F.col("c1") / F.col("t")) * 1e6).cast("long")
            + F.lit(2 * SB_BACKOFF_MICRO)
        ).alias("lp1"),
    )
    from ..plans.hints import broadcast_if_small

    # lm3/lm2/lm1 are corpus-n-gram-cardinality tables, NOT tiny keys:
    # broadcast only while Catalyst's own size estimate says they fit
    # (size-guarded, same policy as prefix_filter_jaccard_pairs); at
    # web scale these degrade to key-shuffled hash joins.
    sc = (
        _doc_trigrams(score_df, text_col, id_col)
        .join(broadcast_if_small(lm3), ["w1", "w2", "w3"], "left")
        .join(broadcast_if_small(lm2), ["w2", "w3"], "left")
        .join(broadcast_if_small(lm1), ["w3"], "left")
        .select(
            id_col,
            F.coalesce("lp3", "lp2", "lp1", F.lit(OOV_LOGP_MICRO)).alias(
                "lp"
            ),
            F.when(F.col("lp3").isNotNull(), "tri")
            .when(F.col("lp2").isNotNull(), "bi")
            .when(F.col("lp1").isNotNull(), "uni")
            .otherwise("oov")
            .alias("branch"),
        )
    )
    agg = sc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum((F.col("branch") == "tri").cast("long"))
        .cast("long")
        .alias("n_tri_hits"),
        F.sum((F.col("branch") == "bi").cast("long"))
        .cast("long")
        .alias("n_bi_backoffs"),
        F.sum((F.col("branch") == "uni").cast("long"))
        .cast("long")
        .alias("n_uni_backoffs"),
        F.sum((F.col("branch") == "oov").cast("long"))
        .cast("long")
        .alias("n_oov"),
        F.sum("lp").alias("_micro"),
    )
    avg_neg = -F.col("_micro") / 1e6 / F.col("n_trigrams")
    return agg.select(
        F.col(id_col),
        "n_trigrams",
        "n_tri_hits",
        "n_bi_backoffs",
        "n_uni_backoffs",
        "n_oov",
        F.round(avg_neg, 6).alias("avg_neg_logp"),
        F.round(F.exp(F.round(avg_neg, 6)), 3).alias("ppl"),
    )
