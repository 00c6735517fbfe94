"""Round-11 operator tests: ADVICE-fix edge cases first, then the new
quality-classifier / stress additions as they land."""

import pyspark.sql.functions as F
import pytest

from dsci551_edfs_spark.queries import QUERIES


def test_mmr_select_pool_smaller_than_k(spark):
    """k larger than the candidate pool must degrade gracefully to
    |pool| picks (the pre-fix code crashed with TypeError on the None
    returned by .first() once the pool was exhausted)."""
    from dsci551_edfs_spark.pipeline.similarity import mmr_select

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = mmr_select(emb, query_id=0, pool_lo=1, pool_hi=2, k=10).collect()
    assert [r["sel_rank"] for r in rows] == [1, 2]
    assert sorted(r["vec_id"] for r in rows) == [1, 2]


def test_exact_median_empty_table_schema_stable(spark, tmp_path):
    """An empty orders table must return zero rows with the contract
    schema, not raise NameError on unbound tbin/below (pre-fix bug)."""
    src = "/root/testdata/sf0.001"
    empty_dir = str(tmp_path)
    (
        spark.read.parquet(f"{src}/orders.parquet")
        .filter(F.lit(False))
        .write.mode("overwrite")
        .parquet(f"{empty_dir}/orders.parquet")
    )
    out = QUERIES["exact_median_two_pass"](spark, empty_dir)
    assert out.columns == ["median_price", "n_rows"]
    assert out.count() == 0


def test_exact_median_fp_boundary_bin_agreement(spark, tmp_path):
    """Values engineered to sit exactly ON bin edges: pass-2 membership
    now uses the identical floor-division bin expression as pass 1, so
    the in-bin rank offset k can never disagree with the histogram.
    Median of 2049 values = the rank-1025 ascending element."""
    n = 2049
    vals = [(i, float(i)) for i in range(n)]  # lo=0, hi=2048, width=2.0
    df = spark.createDataFrame(vals, "o_orderkey long, o_totalprice double")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    row = QUERIES["exact_median_two_pass"](spark, d).first()
    assert row["n_rows"] == n
    assert row["median_price"] == float((n + 1) // 2 - 1)  # 1024.0


def test_psi_drift_digitless_source_goes_to_group0(spark, tmp_path):
    """Documents whose source has no digits must land in group 0 (not
    be silently dropped), matching the oracle's coalesce(TRY_CAST)."""
    src = "/root/testdata/sf0.001"
    d = str(tmp_path)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    docs.withColumn(
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.lit("crawl-nodigits")).otherwise(
            F.col("source")
        ),
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = QUERIES["psi_drift_sources"](spark, d).collect()
    assert len(out) == 10  # full decile grid survives
    # group-0 (cnt_a) totals include the redirected docs: with testdata
    # sources all digit-suffixed, redirecting ~1/7 of docs into group 0
    # must strictly raise the group-0 count sum vs the unmodified table.
    base = QUERIES["psi_drift_sources"](spark, src).collect()
    assert sum(r["cnt_a"] for r in out) > sum(r["cnt_a"] for r in base)


def test_quality_lr_train_trajectory_contract(spark, sf_dir):
    """3 rounds x (64 buckets + bias) rows, integer weights; bias must
    MOVE (the gradient is nonzero on any non-degenerate label split)."""
    out = QUERIES["quality_lr_train"](spark, sf_dir).collect()
    assert len(out) == 3 * 65
    biases = {r["step"]: r["w_micro"] for r in out if r["bucket"] == -1}
    assert sorted(biases) == [1, 2, 3]
    assert biases[3] != 0
    from dsci551_edfs_spark.pipeline.dedup import release_cached

    release_cached()


def test_quality_lr_calibration_counts_whole_corpus(spark, sf_dir):
    """Every document lands in exactly one decile bin."""
    import pyspark.sql.functions as F2

    out = QUERIES["quality_lr_calibration"](spark, sf_dir)
    total = out.agg(F2.sum("n_docs")).first()[0]
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == n
    from dsci551_edfs_spark.pipeline.dedup import release_cached

    release_cached()


def test_retrieval_ndcg_bounds_and_anchor(spark, sf_dir):
    """nDCG in (0, 1e6]; dcg <= idcg by construction; 3 query terms."""
    rows = {r["term"]: r for r in QUERIES["retrieval_ndcg"](spark, sf_dir).collect()}
    assert sorted(rows) == ["dup", "hash", "scan"]
    for r in rows.values():
        assert 0 < r["ndcg_micro"] <= 1_000_000
        assert r["dcg_micro"] <= r["idcg_micro"]


def test_gdpr_cascade_ledger_consistency(spark, sf_dir):
    """rows_after = before - removed everywhere; orphans all 0 (the
    cascade-completeness proof); removed orders actually reference
    forgotten customers."""
    rows = {r["tbl"]: r for r in QUERIES["gdpr_delete_cascade"](spark, sf_dir).collect()}
    assert sorted(rows) == ["customer", "lineitem", "orders"]
    for r in rows.values():
        assert r["rows_after"] == r["rows_before"] - r["rows_removed"]
        assert r["orphans_after"] == 0
    assert rows["customer"]["rows_removed"] > 0  # cohort non-empty
    assert rows["orders"]["rows_removed"] >= rows["customer"]["rows_removed"] // 2


def test_quality_lr_cv_fold_partition(spark, sf_dir):
    """Folds partition the corpus: sum(n_test) == corpus rows and each
    fold's n_train == corpus - its n_test; accuracy in [0, 1e6]."""
    rows = QUERIES["quality_lr_cv"](spark, sf_dir).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2]
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_test"] for r in rows) == n
    for r in rows:
        assert r["n_train"] == n - r["n_test"]
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert 0 <= r["acc_micro"] <= 1_000_000
    from dsci551_edfs_spark.pipeline.dedup import release_cached

    release_cached()


def test_streaming_quality_gate_replay_idempotent(spark, sf_dir):
    """Running the gate query twice (same scratch checkpoint + sink)
    must land identical audit rows — the replay-safety contract of the
    idempotent batch sink; and every feed doc appears exactly once."""
    import pyspark.sql.functions as F2

    a = sorted(
        tuple(r) for r in QUERIES["streaming_quality_gate"](spark, sf_dir).collect()
    )
    b = sorted(
        tuple(r) for r in QUERIES["streaming_quality_gate"](spark, sf_dir).collect()
    )
    assert a == b
    n_feed = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F2.col("doc_id") % 5 == 0)
        .count()
    )
    assert len(a) == n_feed
    assert len({r[0] for r in a}) == n_feed  # one row per doc
    from dsci551_edfs_spark.pipeline.dedup import release_cached

    release_cached()


def test_frozen_featurizer_oov_tokens_score_zero(spark):
    """Deployment contract of the frozen featurizer: feed tokens unseen
    in the seed carry NO weight (df join drops them) — an all-OOV feed
    doc has no feature rows at all, and a mixed doc only weighs its
    seed-known tokens."""
    from dsci551_edfs_spark.streaming.quality_gate import (
        featurize_with,
        frozen_featurizer,
    )

    seed = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    dfr, n = frozen_featurizer(seed)
    assert n == 2
    feed = spark.createDataFrame(
        [(10, "zzz qqq"), (11, "alpha zzz")],
        "doc_id long, text string",
    )
    feats = featurize_with(feed, dfr, n)
    by_id = {}
    for r in feats.collect():
        by_id.setdefault(r["id"], []).append(r)
    assert 10 not in by_id          # all-OOV doc: zero feature rows
    assert len(by_id[11]) == 1      # only 'alpha' survives
    # alpha df=2, n=2 -> idf ln(1)=0 -> raw weight 0 (featurize_with
    # returns raw w since r13; L1-x happens in doc_feature_frame)
    assert by_id[11][0]["w"] == 0
