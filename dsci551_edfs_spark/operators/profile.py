"""Data profiling: one-pass per-column statistics in long format.

The engine utility behind "what is in this 100 TB table?": a SINGLE wide
aggregate computes every column's counts/nulls/ndv/min/max (partial-
aggregated map-side like any other agg), then an in-memory unpivot emits
one row per column. One scan, one single-row shuffle, no per-column jobs.

`exact_ndv=False` (default) swaps countDistinct for the HLL++ sketch —
at scale exact per-column NDV is a full shuffle per column; the sketch
merges map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "quantiles"]


def profile(df: DataFrame, exact_ndv: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, ndv, min_str, max_str) per column.

    min/max are emitted as strings so heterogeneous column types fit one
    long-format result; numeric consumers re-cast.
    """
    ndv_of = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in df.columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            ndv_of(F.col(c)).alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, _ndv_{c}, _min_{c}, _max_{c}" for c in df.columns
    )
    return wide.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS "
            "(column, n_nulls, ndv, min_str, max_str)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "ndv", "min_str", "max_str")


def quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Order statistics per group: one ``pXX`` column per probability.

    ``approx=False`` uses exact ``percentile`` (linear interpolation, the
    SQL-standard PERCENTILE_CONT semantics) — it buffers each group's
    values, so reserve it for verification scales. ``approx=True`` is the
    100 TB path: ``approx_percentile`` merges fixed-size KLL-like sketches
    map-side, one pass, bounded memory, rank error ≤ 1/accuracy.
    """
    fn = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    aggs = [
        fn(F.col(value_col), p).alias(f"p{int(p * 100):02d}") for p in probs
    ]
    grouped = df.groupBy(*by) if by else df.groupBy()
    return grouped.agg(*aggs)
