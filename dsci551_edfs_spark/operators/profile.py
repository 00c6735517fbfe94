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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile", "quantiles", "robust_zscores"]


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


def robust_zscores(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Median/MAD robust z-scores of an INTEGER value per group — the
    outlier detector that a handful of extreme points cannot poison
    (a mean/stddev z-score inflates its own yardstick; the breakdown
    point of median+MAD is 50%).

    Integer-exact contract (house micro style): medians of integers are
    computed by the RANK formula in doubled units (med2 = lower-middle +
    upper-middle), absolute deviations stay in doubled units, and their
    median lands in quadrupled units (mad4) — all integers, no
    interpolation. The modified z-score 0.6745·(x−med)/MAD rewrites to
    ``1 349 000·(2x − med2) / mad4`` micro-units: ONE bigint/bigint
    double division + round, IEEE-identical on any engine → the oracle
    hash-matches. Groups with mad4 = 0 (over half the values identical)
    are emitted with NULL score rather than dropped — they are the
    "too-stable-to-score" signal, not an error.

    Scale: two group-keyed window passes (rank + conditional pick), no
    global window; group cardinality bounds every state. Returns
    ``key_cols + carry_cols + (value, rz_micro)``.
    """
    v = F.col(value_col).cast("long")
    wall = Window.partitionBy(*key_cols)
    ranked = df.select(*key_cols, v.alias("_v")).select(
        "*",
        F.row_number().over(
            Window.partitionBy(*key_cols).orderBy("_v")
        ).alias("_rn"),
        F.count("*").over(wall).alias("_n"),
    )
    lower = F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("_v"))
    upper = F.when(F.col("_rn") == F.expr("(_n + 2) div 2"), F.col("_v"))
    med = ranked.groupBy(*key_cols).agg(
        (F.min(lower) + F.min(upper)).alias("_med2")
    )
    dev = df.select(*key_cols, *carry_cols, v.alias("_v")).join(
        med, key_cols
    ).select(
        *key_cols,
        *carry_cols,
        "_v",
        "_med2",
        F.abs(2 * F.col("_v") - F.col("_med2")).alias("_dev2"),
    )
    dranked = dev.select(
        "*",
        F.row_number().over(
            Window.partitionBy(*key_cols).orderBy("_dev2", "_v")
        ).alias("_rn"),
        F.count("*").over(wall).alias("_n"),
    )
    dlower = F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("_dev2"))
    dupper = F.when(F.col("_rn") == F.expr("(_n + 2) div 2"), F.col("_dev2"))
    mad = dranked.groupBy(*key_cols).agg(
        (F.min(dlower) + F.min(dupper)).alias("_mad4")
    )
    return (
        dev.join(mad, key_cols)
        .select(
            *key_cols,
            *carry_cols,
            F.col("_v").alias(value_col),
            F.when(
                F.col("_mad4") > 0,
                F.round(
                    (F.lit(1_349_000) * (2 * F.col("_v") - F.col("_med2")))
                    .cast("double")
                    / F.col("_mad4")
                ).cast("long"),
            ).alias("rz_micro"),
        )
    )
