"""As-of + banded range join semantics on hand-built frames."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.operators.temporal import (
    asof_join,
    range_join_point_interval,
)


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0),
            (1, ts("2024-01-01 10:05:00"), 101.0),
            (2, ts("2024-01-01 10:03:00"), 50.0),
        ],
        "key long, ts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:59:00"), "early"),   # before any quote
            (1, ts("2024-01-01 10:00:00"), "exact"),   # ties with quote ts
            (1, ts("2024-01-01 10:04:59"), "mid"),
            (1, ts("2024-01-01 10:30:00"), "late"),
            (2, ts("2024-01-01 10:04:00"), "other-key"),
            (3, ts("2024-01-01 10:04:00"), "no-key"),
        ],
        "key long, ts timestamp, tag string",
    )


def test_asof_backward(quotes, trades):
    out = {
        r["tag"]: r["px_right"]
        for r in asof_join(trades, quotes, on="key").collect()
    }
    assert out == {
        "early": None,        # nothing at or before -> null (left outer)
        "exact": 100.0,       # equal ts matches
        "mid": 100.0,         # 10:05 quote is in the future
        "late": 101.0,
        "other-key": 50.0,    # keys don't leak across partitions
        "no-key": None,
    }


def test_asof_forward(quotes, trades):
    out = {
        r["tag"]: r["px_right"]
        for r in asof_join(trades, quotes, on="key", direction="forward").collect()
    }
    assert out == {
        "early": 100.0,
        "exact": 100.0,   # equal ts matches in forward direction too
        "mid": 101.0,
        "late": None,     # nothing at or after
        "other-key": None,
        "no-key": None,
    }


def test_asof_keeps_all_left_rows(quotes, trades):
    assert asof_join(trades, quotes, on="key").count() == trades.count()


def test_range_join_banding(spark):
    points = spark.createDataFrame(
        [(i, ts(f"2024-01-01 10:{m:02d}:00")) for i, m in enumerate([0, 14, 15, 29, 45])],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:30:00"))],
        "iid long, start timestamp, end timestamp",
    )
    # bucket deliberately smaller than the interval span -> multi-bucket explode
    out = range_join_point_interval(points, intervals, bucket="5 minutes")
    got = sorted(r["pid"] for r in out.collect())
    assert got == [1, 2, 3]  # 10:14, 10:15, 10:29; end is exclusive, 10:00 before
    assert "_bsec" not in out.columns


def test_hypertable_rollup_merges_losslessly_and_prunes(spark, sf_dir, tmp_path):
    """Hourly partials re-aggregated to day == direct day aggregation over
    raw events; date-range reads prune rollup partitions at the source."""
    from dsci551_edfs_spark.operators import rollup_hypertable as HT
    from dsci551_edfs_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup")
    HT.build_rollup(ev, dest, bucket="1 hour")

    day = HT.reaggregate(HT.read_rollup(spark, dest), grain="1 day")
    direct = ev.groupBy(
        F.window("ts", "1 day").start.alias("bucket_start"),
        F.col("event_type").alias("key"),
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 3).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    merged = day.select(
        "bucket_start", "key", "n_events",
        F.round("sum_value", 3).alias("sum_value"), "min_value", "max_value",
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    pruned = HT.read_rollup(spark, dest, start="2024-01-10", end="2024-01-12")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:120], plan
    mx = pruned.select(F.max(F.col("day").cast("string"))).collect()[0][0]
    assert mx <= "2024-01-12"


def test_hypertable_rollup_composes_to_week(spark, sf_dir, tmp_path):
    """Rollup-of-rollup: hour -> day -> week must equal hour -> week
    directly (mergeable partials are associative)."""
    from dsci551_edfs_spark.operators import rollup_hypertable as HT
    from dsci551_edfs_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "rollup_w")
    HT.build_rollup(ev, dest, bucket="1 hour")
    hourly = HT.read_rollup(spark, dest)
    via_day = HT.reaggregate(HT.reaggregate(hourly, "1 day").drop("avg_value"), "7 days")
    direct = HT.reaggregate(hourly, "7 days")
    cols = ["bucket_start", "key", "n_events", "min_value", "max_value"]
    assert via_day.select(cols).exceptAll(direct.select(cols)).count() == 0
    assert direct.select(cols).exceptAll(via_day.select(cols)).count() == 0
