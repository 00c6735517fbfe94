"""Salted-join correctness: result equals a plain join, hot keys spread."""

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.operators.skew import salted_join, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 dominates: 10_000 rows; keys 2..50 get 10 each
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = (
        spark.range(49 * 10)
        .select((F.col("id") % 49 + 2).alias("k"), F.col("id").alias("v"))
    )
    return hot.union(cold)


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(60).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("nm")
    )


def test_top_keys(skewed):
    assert top_keys(skewed, "k", n=3, min_count=100) == [1]


def test_salted_join_matches_plain(skewed, dim):
    plain = skewed.join(dim, on="k").groupBy("k").count()
    salted = salted_join(skewed, dim, "k", hot_keys=[1], salts=8).groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salt_actually_spreads(skewed, dim):
    hot = F.array(F.lit(1))
    l_salted = skewed.withColumn(
        "_salt",
        F.when(F.array_contains(hot, F.col("k")),
               (F.rand(seed=7) * 8).cast("int")).otherwise(F.lit(0)),
    )
    used = l_salted.filter("k = 1").select("_salt").distinct().count()
    assert used == 8
