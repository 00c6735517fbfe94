"""Quirk-pinning tests for the PMR aggregates (SURVEY.md §2.4, FIXTURES.md §2)."""

import math

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.operators import aggregates as agg


@pytest.fixture(scope="module")
def quirks_df(spark):
    # neg_only: all < 0 with nulls; all_null_group: null for key 'b';
    # hash_key_nullable: nullable partition key
    rows = [
        # (key, neg_only, grouped, plain)
        ("a", -5.0, 1.0, 10.0),
        ("a", -2.0, 3.0, 20.0),
        ("b", None, None, 30.0),
        ("b", -7.0, None, 40.0),
        (None, -1.0, 5.0, None),
    ]
    return spark.createDataFrame(rows, "key string, neg_only double, grouped double, plain double")


def test_avg_skips_nulls(quirks_df):
    # reference: all-NaN partitions excluded from numerator AND denominator
    # (combined_flask.py:763-764) == SQL null-skipping avg
    assert agg.get_avg(quirks_df, "grouped") == pytest.approx((1 + 3 + 5) / 3)


def test_max_spark_vs_legacy(quirks_df):
    # Spark-correct max of all-negative column is negative
    assert agg.get_max(quirks_df, "neg_only") == -1.0
    # legacy (combined_flask.py:741, :777): nulls→0 and floor at 0 ⇒ 0
    assert agg.get_max(quirks_df, "neg_only", mode="legacy") == 0.0


def test_min_spark_vs_firebase(quirks_df):
    assert agg.get_min(quirks_df, "plain") == 10.0
    # firebase 0-seed bug (combined_flask.py:1676-1688): min(min, 0) ⇒ 0
    assert agg.get_min(quirks_df, "plain", mode="legacy_firebase") == 0.0


def test_count(quirks_df):
    assert agg.get_count(quirks_df) == 5
    assert agg.get_count(quirks_df, "grouped") == 3  # null-skipping


def test_validate_rejects_non_numeric(quirks_df):
    # reference rejects non-numeric cols (combined_flask.py:569-573)
    with pytest.raises(TypeError):
        agg.get_avg(quirks_df, "key")
    with pytest.raises(KeyError):
        agg.get_avg(quirks_df, "missing_col")


def test_format_three_decimals():
    # output contract: 3-decimal rounding (combined_flask.py:770)
    assert agg.format_result("avg", 25.3756) == "The overall average is 25.376"
    assert agg.format_result("max", None).startswith("The overall maximum is undefined")


def test_partition_debug(quirks_df):
    nn = quirks_df.filter(F.col("plain").isNotNull())
    out = agg.partition_debug(nn.repartition(2), "plain", "avg").collect()
    assert sum(r["size"] for r in out) == 4
    total = sum(r["partial"] * r["size"] for r in out if r["partial"] is not None)
    # weighted merge of partials == global sum (the reference's reduce step)
    assert math.isclose(total, 100.0)


def test_agg_against_testdata(spark, sf_dir):
    from dsci551_edfs_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = agg.get_avg(li, "l_quantity")
    mx = agg.get_max(li, "l_quantity")
    mn = agg.get_min(li, "l_quantity")
    assert mn <= a <= mx
    # pruned avg only aggregates matching rows
    pruned = li.filter(F.col("l_returnflag") == "A").agg(F.avg("l_quantity")).collect()[0][0]
    df2 = li.withColumn("__edfs_part__", F.col("l_returnflag"))
    assert agg.get_avg(df2, "l_quantity", hash_value="A") == pytest.approx(pruned)
