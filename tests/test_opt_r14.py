"""Round-14 optimization pins.

1) Bounded-collect guards (r13 verdict item 7): the four driver-folded
   tails assert their key/score-domain cardinality contract instead of
   OOMing the driver when it is violated. Caps are module constants so
   the trip is testable cheaply (monkeypatch cap, tiny frame).
2) rank_auc_from_grouped integral-score assert (r13 ADVICE, medium).
3) largest_remainder_allocation contract asserts (r13 ADVICE, low).
4) spread_small's estimate-based small/large rule replaces the
   df.rdd.getNumPartitions() driver probe (guide §7.3) — behavior pins
   live in test_memo.py; here we pin the byte-size conf parser.
"""

import pytest
from pyspark.sql import functions as F


def test_collect_bounded_under_and_over_cap(spark):
    from dsci551_edfs_spark.plans.guards import collect_bounded

    df = spark.range(5).select(F.col("id"))
    rows = collect_bounded(df, cap=5, what="t")
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="t: bounded-collect"):
        collect_bounded(df, cap=4, what="t")


def test_remainder_alloc_guard_trips_past_cap(spark, monkeypatch):
    from dsci551_edfs_spark.pipeline import curation as CUR

    w = spark.createDataFrame(
        [("a", 300000), ("b", 300000), ("c", 200000), ("d", 200000)],
        "source string, w long",
    )
    monkeypatch.setattr(CUR, "_ALLOC_COLLECT_CAP", 3)
    with pytest.raises(ValueError, match="largest_remainder_allocation"):
        CUR.largest_remainder_allocation(w, 10, weight_col="w")


def test_remainder_alloc_contract_asserts(spark):
    from dsci551_edfs_spark.pipeline import curation as CUR

    dup = spark.createDataFrame(
        [("a", 500000), ("a", 500000)], "source string, w long"
    )
    with pytest.raises(ValueError, match="duplicate allocation keys"):
        CUR.largest_remainder_allocation(dup, 10, weight_col="w")
    neg = spark.createDataFrame(
        [("a", 1500000), ("b", -500000)], "source string, w long"
    )
    with pytest.raises(ValueError, match="negative weights"):
        CUR.largest_remainder_allocation(neg, 10, weight_col="w")
    # the happy path is unchanged: exact largest-remainder allocation
    ok = spark.createDataFrame(
        [("a", 600000), ("b", 400000)], "source string, w long"
    )
    out = {
        r["source"]: r["alloc"]
        for r in CUR.largest_remainder_allocation(
            ok, 7, weight_col="w"
        ).collect()
    }
    assert out == {"a": 4, "b": 3} and sum(out.values()) == 7


def test_rank_auc_guard_trips_past_cap(spark, monkeypatch):
    from dsci551_edfs_spark.pipeline import evalmetrics as EM

    g = spark.createDataFrame(
        [(1, 2, 1), (2, 2, 1), (3, 2, 0)], "s long, cnt long, pos long"
    )
    monkeypatch.setattr(EM, "_AUC_COLLECT_CAP", 2)
    with pytest.raises(ValueError, match="rank_auc_from_grouped"):
        EM.rank_auc_from_grouped(g)


def test_rank_auc_rejects_non_integral_scores(spark):
    from dsci551_edfs_spark.pipeline import evalmetrics as EM

    scored = spark.createDataFrame(
        [(0.5, 1), (0.25, 0)], "s double, y long"
    )
    with pytest.raises(TypeError, match="must be integral"):
        EM.rank_auc_report(scored, score_col="s", label_col="y")


def test_mmr_guard_trips_past_cap(spark, monkeypatch):
    from dsci551_edfs_spark.pipeline import similarity as SIM

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    monkeypatch.setattr(SIM, "_MMR_COLLECT_CAP", 3)
    with pytest.raises(ValueError, match="mmr_select"):
        SIM.mmr_select(emb, query_id=0, pool_lo=1, pool_hi=5, k=2)


def test_cal_order_statistic_guard_trips_past_cap(spark, monkeypatch):
    from dsci551_edfs_spark import q_round13 as Q13

    calp = spark.createDataFrame(
        [(i % 5,) for i in range(10)], "p4 long"
    )
    monkeypatch.setattr(Q13, "_CAL_COLLECT_CAP", 4)
    with pytest.raises(ValueError, match="_cal_order_statistic"):
        Q13._cal_order_statistic(calp)


def test_size_conf_bytes_parser():
    from dsci551_edfs_spark.plans.hints import _size_conf_bytes

    assert _size_conf_bytes("134217728") == 128 << 20
    assert _size_conf_bytes("134217728b") == 128 << 20
    assert _size_conf_bytes("128m") == 128 << 20
    assert _size_conf_bytes("128MB") == 128 << 20
    assert _size_conf_bytes("1g") == 1 << 30
    assert _size_conf_bytes("512k") == 512 << 10


# ------------------------------------------------- shared text layout

def test_token_tf_layout_matches_inline(spark, sf_dir):
    """The per-corpus token layout serves EXACTLY the rows the inline
    explode(tokens)→groupBy(id, token) computed — the equivalence the
    r14 consumers (hashed_tfidf_knn, tfidf_doc_pairs, gate train) rely
    on — and its scan carries the bucketed partitioning."""
    from pyspark.sql import functions as F

    from dsci551_edfs_spark.functions.text import tokens
    from dsci551_edfs_spark.sources.registry import load_table
    from dsci551_edfs_spark.sources.shared_text_layout import token_tf

    t = token_tf(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    inline = (
        d.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    assert t.exceptAll(inline).count() == 0
    assert inline.exceptAll(t).count() == 0
    # bucketed scan satisfies the token clustering: groupBy(token) over
    # the layout plans with no Exchange
    plan = (
        t.groupBy("token")
        .agg(F.count("*"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_shingle_posting_layout_matches_inline(spark, sf_dir):
    from pyspark.sql import functions as F

    from dsci551_edfs_spark.pipeline.dedup import shingle_df
    from dsci551_edfs_spark.sources.registry import load_table
    from dsci551_edfs_spark.sources.shared_text_layout import (
        shingle_posting,
    )

    p = shingle_posting(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    inline = (
        shingle_df(d, "text", "doc_id", 3)
        .select("id", F.size("shingles").alias("n_sh"), "shingles")
        .select("id", "n_sh", F.explode("shingles").alias("shingle"))
        .select("id", "n_sh", F.xxhash64("shingle").alias("shash"))
    )
    assert p.exceptAll(inline).count() == 0
    assert inline.exceptAll(p).count() == 0
    plan = (
        p.groupBy("shash")
        .agg(F.count("*"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
