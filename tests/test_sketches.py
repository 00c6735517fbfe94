"""Sketch-aggregate error contracts vs exact answers."""

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.operators import sketches as SK
from dsci551_edfs_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").cache()


def test_approx_ndv_within_rsd(orders):
    approx = SK.approx_ndv(orders, ["o_orderkey", "o_custkey"], rsd=0.02).first()
    exact = orders.agg(
        F.countDistinct("o_orderkey").alias("k"),
        F.countDistinct("o_custkey").alias("c"),
    ).first()
    assert approx["ndv_o_orderkey"] == pytest.approx(exact["k"], rel=0.05)
    assert approx["ndv_o_custkey"] == pytest.approx(exact["c"], rel=0.05)


def test_approx_quantiles_bracket_exact(orders):
    rows = SK.approx_quantiles(orders, "o_totalprice", (0.5,), 0.01).collect()
    got = rows[0]["value"]
    lo, hi = orders.approxQuantile("o_totalprice", [0.47, 0.53], 0.0)
    assert lo <= got <= hi


def test_frequent_items_exact_shares(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = {r["event_type"]: r["share"] for r in
           SK.frequent_items(ev, "event_type", 0.01).collect()}
    total = ev.count()
    exact = {r["event_type"]: r["cnt"] / total for r in
             ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    for k, v in out.items():
        assert v == pytest.approx(exact[k], abs=1e-4)
