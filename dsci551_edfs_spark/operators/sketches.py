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

__all__ = ["approx_ndv", "approx_quantiles", "frequent_items", "count_min_build", "count_min_estimate", "ndv_partials", "ndv_rollup"]


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


def count_min_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch as a (row, bucket, cnt) table: each item
    increments one bucket per hash row (xxhash64 with the row index as an
    extra hashed column = `depth` independent hash functions).

    The build IS a groupBy on at most depth×width keys — map-side
    combinable, so a 100 TB stream shuffles O(sketch), not O(items); the
    materialized sketch is a few thousand rows whatever the corpus size.

    The (depth, width) geometry is stamped onto every sketch row so that
    `count_min_estimate` can recover it from the table itself instead of
    trusting the caller to repeat the same parameters."""
    ex = df.select(
        F.col(col).alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        ex.groupBy(
            "row", F.pmod(F.xxhash64("v", "row"), F.lit(width)).alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("depth", F.lit(int(depth)))
        .withColumn("width", F.lit(int(width)))
    )


def count_min_estimate(
    cms: DataFrame, items: DataFrame, col: str, depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point-estimate item frequencies from a `count_min_build` table:
    min over the depth rows of each item's bucket counter (0 when the
    bucket is empty). Guarantees est >= true count; overestimate bounded
    by collisions (~N/width per row) — pinned in tests.

    The hash geometry is read from the sketch's own (depth, width)
    metadata columns; explicit depth/width arguments are accepted only as
    a cross-check and raise on mismatch (a silently wrong width would
    hash probes into the wrong buckets and break the est>=true bound)."""
    if "depth" in cms.columns and "width" in cms.columns:
        meta = cms.select("depth", "width").first()
        if meta is not None:
            if depth is not None and depth != meta["depth"]:
                raise ValueError(
                    f"depth={depth} does not match sketch depth={meta['depth']}"
                )
            if width is not None and width != meta["width"]:
                raise ValueError(
                    f"width={width} does not match sketch width={meta['width']}"
                )
            depth, width = meta["depth"], meta["width"]
        cms = cms.drop("depth", "width")
    if depth is None or width is None:
        raise ValueError(
            "cms table carries no depth/width metadata; pass both explicitly"
        )
    ex = items.select(
        F.col(col).alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", F.pmod(F.xxhash64("v", "row"), F.lit(width)))
    return (
        ex.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(F.col("v").alias(col))
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_cnt"))
    )


def ndv_partials(
    df: DataFrame,
    grain_col,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable per-grain NDV sketches: one Datasketches HLL per grain
    bucket (``hll_sketch_agg`` — map-side combinable, the shuffle carries
    O(2^lg_k)-byte sketches, never values). The materialized partial
    table is what a continuous aggregate stores: any COARSER grain's
    distinct count comes from `ndv_rollup` merging sketches — the corpus
    is never rescanned, the re-aggregation property exact COUNT(DISTINCT)
    can never have (distincts don't sum)."""
    return df.groupBy(grain_col).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            "ndv_sketch"
        ),
        F.count("*").cast("long").alias("n_rows"),
    )


def ndv_rollup(partials: DataFrame, coarse_col) -> DataFrame:
    """Merge fine-grain HLL partials up to a coarser grain:
    ``hll_union_agg`` over the sketch column + an estimate. Union of
    HLLs is EXACTLY the sketch of the union (lossless merge), so the
    rolled-up estimate equals what a direct scan at the coarse grain
    would have produced — pinned in pytest."""
    return (
        partials.groupBy(coarse_col)
        .agg(
            F.hll_union_agg("ndv_sketch").alias("ndv_sketch"),
            F.sum("n_rows").cast("long").alias("n_rows"),
        )
        .select(
            coarse_col,
            F.hll_sketch_estimate("ndv_sketch").cast("long").alias("ndv_est"),
            "n_rows",
        )
    )
