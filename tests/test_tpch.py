"""Extended TPC-H-shape coverage (queries_tpch.py): smoke each query at
sf0.001 against its DuckDB oracle, plus physical-plan assertions for the
scale-critical shapes (Q19's disjunctive join must stay a hash join; Q18's
HAVING membership must be a broadcast semi join)."""

import duckdb
import pytest

from dsci551_edfs_spark.plans.debug import explain_str
from dsci551_edfs_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()

TPCH = [
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", TPCH)
def test_matches_oracle_at_smoke_scale(spark, duck, name):
    df = QUERIES[name](spark, SF)
    srows = df.collect()
    rel = duck.sql(ORACLES[name])
    drows = rel.fetchall()
    assert sorted(df.columns) == sorted(rel.columns)
    assert len(srows) == len(drows)
    assert _canon([tuple(r) for r in srows], df.columns) == _canon(
        drows, list(rel.columns)
    )


def test_q19_disjunction_is_still_a_hash_join(spark):
    # The OR-of-ANDs must ride as a residual on the p_partkey equi-join;
    # a nested-loop fallback here is quadratic and unusable at scale.
    plan = explain_str(QUERIES["q19_discounted_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_membership_is_a_semi_join(spark):
    plan = explain_str(QUERIES["q18_large_volume_customer"](spark, SF))
    assert "LeftSemi" in plan


def test_q5_single_fact_shuffle(spark):
    # All dims broadcast: the only SortMergeJoin/Exchange pair allowed is
    # lineitem join orders.
    plan = explain_str(QUERIES["q5_local_supplier_volume"](spark, SF))
    assert plan.count("SortMergeJoin") <= 1
    assert "BroadcastHashJoin" in plan
