"""Corpus distribution-drift monitoring: per-token KL divergence between
two snapshots (this week's crawl vs last week's, source A vs source B).

The pipeline-health question "did the data change?" reduces to comparing
token (or any categorical feature) distributions. Contribution of token t
to KL(P‖Q) with add-one smoothing:

    p_t · ln(p_t / q_t),  p_t = (c_a+1)/(T_a+V),  q_t = (c_b+1)/(T_b+V)

Each per-token contribution is rounded to integer NANO-nats before any
summation (same exactness design as pipeline/lm.py — no FP
accumulation-order dependence), so drift totals are reproducible
bit-for-bit and the DuckDB oracle restates the identical arithmetic.

Scale shape: two count aggregations (map-side combinable, token keys), a
full-outer join of the two count tables (vocab-sized, not corpus-sized),
and the scalar totals broadcast back — the corpus is scanned once per
side regardless of vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["token_distribution_drift"]


def token_distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-token drift table ``(token, cnt_a, cnt_b, kl_nano)`` where
    kl_nano = round(p·ln(p/q)·1e9) — positive where the token is
    over-represented in A, negative where under-represented; the exact
    integer sum of the column is KL(A‖B) in nano-nats."""
    ca = (
        df_a.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt_a"))
    )
    cb = (
        df_b.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt_b"))
    )
    v = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
    )
    tot = v.agg(
        F.sum("cnt_a").alias("_sa"),
        F.sum("cnt_b").alias("_sb"),
        F.count("*").alias("_nv"),
    )
    p = (F.col("cnt_a") + 1.0) / (F.col("_sa") + F.col("_nv"))
    q = (F.col("cnt_b") + 1.0) / (F.col("_sb") + F.col("_nv"))
    return v.crossJoin(F.broadcast(tot)).select(
        "token",
        "cnt_a",
        "cnt_b",
        F.round(p * F.log(p / q) * 1e9).cast("long").alias("kl_nano"),
    )
