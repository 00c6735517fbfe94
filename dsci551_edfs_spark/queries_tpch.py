"""Extended TPC-H-shape relational coverage (SURVEY.md §2.5 phase 5).

The reference exposes no user-facing joins at all (`combined_flask.py:284-295`
uses SQL joins only internally to stitch replica metadata), so this entire
module is Spark-native additive capability: the classic TPC-H query shapes
adapted to the driver's trimmed schema (no partsupp, no l_commitdate /
l_receiptdate / l_shipmode — see TESTDATA.md).

Scale posture baked into every query:
- dimension sides (region/nation/supplier, filtered customer) are broadcast —
  at 100 TB the fact tables shuffle at most once, on their join key;
- top-k always runs as TakeOrderedAndProject (orderBy().limit()), never a
  global sort;
- correlated scalar subqueries are written decorrelated (groupBy + join),
  which is the plan Catalyst would rewrite to anyway and keeps the min/max
  aggregation partial map-side;
- all FP aggregates are rounded identically here and in the DuckDB oracle so
  the driver's value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, q

__all__: list[str] = []


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@q(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: 6-way join where customer and supplier must share a nation.

    Join order: lineitem (largest) joins orders once on its key; nation⨝region
    and supplier are broadcast so the only shuffle of fact data is
    lineitem⨝orders. The c_nationkey = s_nationkey equi-constraint rides the
    customer join condition instead of a post-join filter, letting Catalyst
    prune rows inside the join."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by year.

    The two-nation disjunction is evaluated AFTER both broadcast joins attach
    the nation names — on two already-filtered broadcast dims this is cheap,
    and the supplier/customer sides are each pre-filtered to the 2-nation set
    so the broadcast hash tables stay tiny at any scale."""
    nations = ["NATION_1", "NATION_2"]
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(nations))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c), o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END), 2)
               AS nation_volume,
           round(sum(volume), 2) AS total_volume
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (market share): 8-way join, one supplier nation's volume vs
    total per year. Emits numerator and denominator separately instead of the
    ratio — the division of two independently-summed doubles is the one place
    TPC-H output is not reproducible across engines at round boundaries.
    part (filtered), supplier+nation, customer+nation+region all broadcast;
    lineitem⨝orders is the lone shuffle."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select("s_suppkey", "nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0)),
                2,
            ).alias("nation_volume"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


@q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate < TIMESTAMP '1998-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by returned-goods revenue in a quarter.

    Orders the LIMIT by the ROUNDED revenue with c_custkey as tiebreaker so
    Spark and the oracle select an identical row set even when the unrounded
    sums differ in the last ulp. TakeOrderedAndProject keeps the top-k
    partial per partition."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1998-01-01"))
        & (F.col("o_orderdate") < _ts("1998-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "q14_promo_revenue",
    """
    SELECT round(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END), 2) AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional vs total revenue for one
    month. part carries only (p_partkey, p_type) into a broadcast join —
    2 columns of a wide dim, real column pruning at the parquet scan. The
    ratio is left to the consumer (same FP-division rationale as Q8)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(vol), 2).alias("total_revenue"),
        )
    )


@q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): the scalar-subquery max is computed as an
    unpartitioned window max OVER THE AGGREGATED frame — one row per supplier
    (|suppliers| ≪ |lineitem|), so the single-partition window is a few
    thousand rows even at 100 TB fact scale. Comparing rounded revenues makes
    the argmax tie-handling identical to the oracle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    top = rev.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): HAVING-subquery membership as a
    broadcast LEFT SEMI join. The qualifying-order set is aggregated first
    (partial sums map-side), and only then does lineitem re-join it — the
    semi join ships just the tiny key set, never the fact table. Quantities
    are integral-valued doubles, so sum > 300 is FP-exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@q(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 (disjunctive predicates): the classic OR-of-ANDs join.
    Expressed as an equi-join on p_partkey with the disjunction as a residual
    condition — Catalyst still plans a (broadcast) hash join because the
    equi-conjunct is extractable; a naive theta-join formulation would fall
    back to BroadcastNestedLoopJoin and die at scale. part is pre-filtered
    to the union of brand/size ranges so the broadcast side shrinks first."""
    p = _t(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
        )
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 15))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_partkey == p.p_partkey) & (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("l_quantity").between(20, 30)
        )
    )
    return li.join(F.broadcast(p), cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@q(
    "q22_dormant_customers",
    """
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape adapted to this dataset (every customer has SOME
    order, so 'no orders at all' is empty; 'dormant this year' is not):
    above-average-balance customers with no 2001 order. The scalar avg is a
    1-row cross-join broadcast; the NOT IN becomes a broadcast LEFT ANTI
    join on the distinct recent-buyer keys — both sides of the anti join
    stay key-only."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(recent), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@q(
    "q2_min_cost_supplier",
    """
    WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM part, supplies, supplier, nation
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND s_nationkey = n_nationkey AND p_size = 10
      AND s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM supplies sp2, supplier s2
        WHERE sp2.l_partkey = p_partkey AND s2.s_suppkey = sp2.l_suppkey
      )
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape without partsupp: the parts-supplied relation is
    derived as DISTINCT (l_partkey, l_suppkey) from lineitem, and the
    correlated 'cheapest supplier per part' subquery is written decorrelated:
    groupBy(part).min(acctbal) then an equality join back. The min compares
    raw stored doubles (no arithmetic), so cross-engine equality is exact.
    At scale the distinct is the only wide shuffle; everything after operates
    on |parts|-sized frames."""
    supplies = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    cost = supplies.join(
        F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_partkey", "l_suppkey", "s_acctbal")
    min_cost = cost.groupBy("l_partkey").agg(
        F.min("s_acctbal").alias("min_bal")
    )
    best = cost.join(F.broadcast(min_cost), "l_partkey").filter(
        F.col("s_acctbal") == F.col("min_bal")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    n = _t(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(
            F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name"
        )
    )
