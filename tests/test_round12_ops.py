"""Round-12 additions: exact rank-sum ROC/PR-AUC (pipeline/evalmetrics),
the shared multi-column running-totals primitive, and the bucketed
mutual-kNN scale twin's contracts."""

import pytest
from pyspark.sql import functions as F


def test_running_totals_two_columns_match_naive(spark):
    """Multi-column two-phase running totals == naive prefix sums for
    BOTH columns, sharing one pass, with more range partitions than
    rows (offset bookkeeping holds across empty partitions)."""
    from dsci551_edfs_spark.operators.cumulative import running_totals

    rows = [(i, (i * 7) % 13 + 1, (i * 3) % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in running_totals(
            df, ["k"], [("a", "cum_a"), ("b", "cum_b")], rank_partitions=64
        ).collect()
    }
    acc_a = acc_b = 0
    want = {}
    for k, a, b in sorted(rows):
        acc_a += a
        acc_b += b
        want[k] = (acc_a, acc_b)
    assert got == want


def test_rank_auc_pairwise_reference(spark):
    """ROC-AUC from midranks == the O(n^2) pairwise definition
    (wins + half-ties over pos*neg pairs), on a tie-heavy vector; PR-AUC
    within 2 micro of the float step-AP."""
    from dsci551_edfs_spark.pipeline.evalmetrics import rank_auc_report

    data = [
        (3, 1), (3, 0), (3, 1), (2, 0), (2, 0), (2, 1),
        (1, 0), (1, 0), (5, 1), (5, 0), (0, 0), (0, 1),
    ]
    df = spark.createDataFrame(data, "s long, y long")
    np_, nn, roc, pr = rank_auc_report(df, "s", "y")
    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    assert (np_, nn) == (len(pos), len(neg))
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0
               for p in pos for q in neg)
    want_roc = (2 * 10**6 * int(2 * wins) + 2 * np_ * nn) // (4 * np_ * nn)
    assert roc == want_roc
    # float step-AP reference
    from collections import Counter

    cnt, posc = Counter(s for s, _ in data), Counter(
        s for s, y in data if y == 1
    )
    n, ap = len(data), 0.0
    scores = sorted(cnt, reverse=True)
    ge_c = ge_p = 0
    for s in scores:
        ge_c += cnt[s]
        ge_p += posc[s]
        ap += (posc[s] / np_) * (ge_p / ge_c)
    assert abs(pr - round(ap * 1e6)) <= 2


def test_rank_auc_edge_cases(spark):
    """Constant scores -> ROC exactly 0.5 (midrank correction);
    all-positive -> ROC 0 / PR 1e6; all-negative -> (0, 0); a perfect
    separator -> ROC and PR exactly 1e6."""
    from dsci551_edfs_spark.pipeline.evalmetrics import rank_auc_report

    const = spark.createDataFrame(
        [(7, 1), (7, 0), (7, 1), (7, 0)], "s long, y long"
    )
    assert rank_auc_report(const, "s", "y") == (2, 2, 500000, 500000)
    allpos = spark.createDataFrame([(1, 1), (2, 1)], "s long, y long")
    assert rank_auc_report(allpos, "s", "y") == (2, 0, 0, 1000000)
    allneg = spark.createDataFrame([(1, 0), (2, 0)], "s long, y long")
    assert rank_auc_report(allneg, "s", "y") == (0, 2, 0, 0)
    perfect = spark.createDataFrame(
        [(9, 1), (8, 1), (2, 0), (1, 0)], "s long, y long"
    )
    assert rank_auc_report(perfect, "s", "y") == (2, 2, 1000000, 1000000)


def test_quality_lr_auc_query_shape(spark, sf_dir):
    """The registered query reports both scorers with sane bounds and
    consistent class counts between legs (same corpus, same label)."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = {r["scorer"]: r for r in QUERIES["quality_lr_auc"](
        spark, sf_dir
    ).collect()}
    release_cached()
    assert set(rows) == {"lr", "rule"}
    for r in rows.values():
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        assert 0 <= r["roc_auc_micro"] <= 10**6
        assert 0 <= r["pr_auc_micro"] <= 10**6
    assert (rows["lr"]["n_pos"], rows["lr"]["n_neg"]) == (
        rows["rule"]["n_pos"],
        rows["rule"]["n_neg"],
    )


def test_mutual_knn_bucketed_planted_recall(spark):
    """Planted-twin recall: pairs at Hamming < bands are GUARANTEED to
    survive banded blocking (pigeonhole), so every planted near-pair
    must come back mutually ranked 1 with its exact distance — and the
    exact all-pairs twin must agree on those rows."""
    import random

    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.pipeline.similarity import (
        mutual_knn_hamming,
        mutual_knn_hamming_bucketed,
    )

    rng = random.Random(12)
    rows = []
    planted = []
    for i in range(40):
        a = [rng.choice((-1.0, 1.0)) for _ in range(64)]
        rows.append((2 * i, a))  # a-side: even ids
        if i < 8:  # plant twins at Hamming 2 (< bands=4 -> guaranteed)
            b = list(a)
            for j in rng.sample(range(64), 2):
                b[j] = -b[j]
            planted.append((2 * i, 2 * i + 1))
        else:  # independent b-side vector
            b = [rng.choice((-1.0, 1.0)) for _ in range(64)]
        rows.append((2 * i + 1, b))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a_side = emb.filter("vec_id % 2 = 0")
    b_side = emb.filter("vec_id % 2 = 1")
    got = {
        (r["id_a"], r["id_b"]): r
        for r in mutual_knn_hamming_bucketed(
            a_side, b_side, k=5, bands=4
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r
        for r in mutual_knn_hamming(a_side, b_side, k=5).collect()
    }
    release_cached()
    for pair in planted:
        assert pair in got, f"planted pair {pair} lost by blocking"
        assert got[pair]["hamming"] == 2
        assert got[pair]["rank_ab"] == 1 and got[pair]["rank_ba"] == 1
        assert pair in exact
        assert exact[pair]["hamming"] == 2


def test_quality_lr_threshold_sweep_invariants(spark, sf_dir):
    """21 threshold rows; confusion counts tie out to one (n, np) pair;
    recall is monotone non-increasing in the threshold; the t=0 row
    passes everything (tp=np, fp=all negatives)."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = sorted(
        QUERIES["quality_lr_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    release_cached()
    assert [r["threshold"] for r in rows] == list(range(0, 10001, 500))
    n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    np_ = rows[0]["tp"] + rows[0]["fn"]
    for r in rows:
        assert r["tp"] + r["fn"] == np_
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert 0 <= r["prec_micro"] <= 10**6
        assert 0 <= r["rec_micro"] <= 10**6
        assert 0 <= r["f1_micro"] <= 10**6
    assert rows[0]["tp"] == np_ and rows[0]["fn"] == 0
    assert rows[0]["rec_micro"] == 10**6
    recalls = [r["rec_micro"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)


def test_mutual_knn_blocking_recall_bounds(spark, sf_dir):
    """The audit's counts are internally consistent: common <= both leg
    sizes, micro ratios in range, and the same numbers reproduce from
    the two registered twin queries directly."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    row = QUERIES["ann_mutual_knn_blocking_recall"](spark, sf_dir).first()
    exact = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["ann_mutual_knn_binary"](spark, sf_dir).collect()
    }
    buck = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["ann_mutual_knn_binary_bucketed"](
            spark, sf_dir
        ).collect()
    }
    release_cached()
    assert row["n_exact"] == len(exact)
    assert row["n_bucketed"] == len(buck)
    assert row["n_common"] == len(exact & buck)
    assert row["n_common"] <= min(row["n_exact"], row["n_bucketed"])
    assert 0 <= row["recall_micro"] <= 10**6
    assert 0 <= row["precision_micro"] <= 10**6


def test_quality_lr_ece_matches_bins(spark, sf_dir):
    """ECE recomputed in Python from the registered calibration bins
    equals the registered one-number query (same trained model)."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    bins = QUERIES["quality_lr_calibration"](spark, sf_dir).collect()
    row = QUERIES["quality_lr_ece"](spark, sf_dir).first()
    release_cached()
    n = sum(b["n_docs"] for b in bins)
    gap_sum = sum(
        abs(100 * b["sum_p4"] - 10**6 * b["n_pass"]) for b in bins
    )
    assert row["n_docs"] == n
    assert row["n_bins"] == len(bins)
    assert row["ece_micro"] == (2 * gap_sum + n) // (2 * n)
    mce = max(
        (2 * abs(100 * b["sum_p4"] - 10**6 * b["n_pass"]) + b["n_docs"])
        // (2 * b["n_docs"])
        for b in bins
    )
    assert row["mce_micro"] == mce
    assert row["mce_micro"] >= row["ece_micro"]


def test_lang_id_eval_consistency(spark, sf_dir):
    """Per-class counts tie out: sum(n_true) == sum(n_pred) == corpus
    size; tp <= min(n_true, n_pred); 'und' has recall 0 (no doc is
    truly unidentifiable); micro metrics in range."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["lang_id_eval"](spark, sf_dir).collect()
    n_docs = QUERIES["text_stats"](spark, sf_dir).count()
    release_cached()
    assert sum(r["n_true"] for r in rows) == n_docs
    assert sum(r["n_pred"] for r in rows) == n_docs
    for r in rows:
        assert r["tp"] <= min(r["n_true"], r["n_pred"])
        for k in ("prec_micro", "rec_micro", "f1_micro"):
            assert 0 <= r[k] <= 10**6
    und = [r for r in rows if r["lang"] == "und"]
    if und:
        assert und[0]["n_true"] == 0 and und[0]["rec_micro"] == 0


def test_streaming_drift_psi_equals_batch(spark, sf_dir):
    """The streamed PSI table (per-batch partials summed after drain)
    equals the pure-batch restatement on the same slices — the
    batch==stream proof — and the grid is complete with exact counts."""
    import pyspark.sql.functions as F

    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, _t
    from dsci551_edfs_spark.streaming.drift_monitor import (
        decile_counts,
        psi_from_counts,
    )

    got = {
        r["bin"]: (r["cnt_ref"], r["cnt_feed"], r["psi_term_micro"])
        for r in QUERIES["streaming_drift_psi"](spark, sf_dir).collect()
    }
    d = _t(spark, sf_dir, "documents")
    want = {
        r["bin"]: (r["cnt_ref"], r["cnt_feed"], r["psi_term_micro"])
        for r in psi_from_counts(
            decile_counts(d.filter(F.col("doc_id") % 5 != 0)),
            decile_counts(d.filter(F.col("doc_id") % 5 == 0)),
        ).collect()
    }
    release_cached()
    assert set(got) == set(range(10))
    assert got == want
    n_feed = sum(v[1] for v in got.values())
    assert n_feed == d.filter(F.col("doc_id") % 5 == 0).count()


def test_weighted_sample_es_matches_python_replica(spark):
    """The ES selection (md5-uniform, milli-nat log key, id tiebreak)
    equals a pure-Python replica, and a giant-weight item is always
    selected before k tiny-weight competitors run out."""
    import hashlib
    import math

    rows = [(i, (i * 13) % 7 + 1) for i in range(60)]
    rows.append((999, 100000))  # dominant weight
    from dsci551_edfs_spark.pipeline.curation import weighted_sample_es

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["es_key_milli"])
        for r in weighted_sample_es(df, "w", k=10, id_col="doc_id").collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        x = math.log((h + 1.0) / float(1 << 48)) / max(w, 1) * 1e3
        # Spark round() is HALF_UP away from zero
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    want = sorted(
        ((i, key(i, w)) for i, w in rows), key=lambda t: (-t[1], t[0])
    )[:10]
    assert got == want
    assert 999 in {i for i, _ in got}


def test_curriculum_schedule_invariants(spark, sf_dir):
    """Positions are a permutation of 1..n, ordered by (q4 desc, id),
    and the 4 phases split the corpus into near-equal quarters."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["curriculum_schedule"](spark, sf_dir).collect()
    release_cached()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    keys = [(-r["q4"], r["doc_id"]) for r in by_pos]
    assert keys == sorted(keys)
    from collections import Counter

    phases = Counter(r["phase"] for r in rows)
    assert set(phases) == {0, 1, 2, 3}
    assert max(phases.values()) - min(phases.values()) <= 1


def test_ks_length_drift_bounds(spark, sf_dir):
    """KS is in [0, 1e6]; cohort sizes tie out to the corpus; the
    reported argmax length is a real length in the corpus."""
    import pyspark.sql.functions as F

    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, _t

    row = QUERIES["ks_length_drift"](spark, sf_dir).first()
    d = _t(spark, sf_dir, "documents")
    n = d.count()
    lengths = {
        r["v"]
        for r in d.select(
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("v")
        ).collect()
    }
    release_cached()
    assert row["n1"] + row["n2"] == n
    assert 0 <= row["ks_micro"] <= 10**6
    assert row["ks_at_value"] in lengths


def test_source_overlap_matrix_invariants(spark, sf_dir):
    """Every pair ordered src_a < src_b and unique; common <= min of the
    set sizes; Jaccard in (0, 1e6]; per-source shingle-set sizes agree
    with a direct distinct count."""
    import pyspark.sql.functions as F

    from dsci551_edfs_spark.pipeline.curation import ngram_array
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, _t

    rows = QUERIES["source_overlap_matrix"](spark, sf_dir).collect()
    d = _t(spark, sf_dir, "documents")
    direct = {
        r["source"]: r["n"]
        for r in d.filter(F.trim("text") != "")
        .select("source", F.explode(ngram_array(F.col("text"), 3)).alias("s"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    release_cached()
    seen = set()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert (r["src_a"], r["src_b"]) not in seen
        seen.add((r["src_a"], r["src_b"]))
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0 < r["jaccard_micro"] <= 10**6
        assert r["n_a"] == direct[r["src_a"]]
        assert r["n_b"] == direct[r["src_b"]]


def test_stratified_weighted_sample_invariants(spark, sf_dir):
    """k rows per stratum (where the stratum has >= k docs), ranks
    1..k, per-stratum keys descending, and each stratum's selection
    equals the global sampler restricted to that stratum."""
    from collections import Counter

    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["stratified_weighted_sample_tokens"](
        spark, sf_dir
    ).collect()
    release_cached()
    per = Counter(r["source"] for r in rows)
    assert all(v == 5 for v in per.values())
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["sample_rank"])
        assert [r["sample_rank"] for r in rs] == [1, 2, 3, 4, 5]
        keys = [(-r["es_key_milli"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_source_lang_mi_sums_to_nonneg_mi(spark, sf_dir):
    """Marginals tie out and total MI (sum of frozen terms) is
    non-negative up to the per-cell micro rounding budget."""
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["source_lang_mi"](spark, sf_dir).collect()
    release_cached()
    n = sum(r["n_xy"] for r in rows)
    from collections import defaultdict

    mx, my = defaultdict(int), defaultdict(int)
    for r in rows:
        mx[r["source"]] += r["n_xy"]
        my[r["lang"]] += r["n_xy"]
    for r in rows:
        assert r["n_x"] == mx[r["source"]]
        assert r["n_y"] == my[r["lang"]]
    total = sum(r["mi_term_micro"] for r in rows)
    assert total >= -len(rows)  # MI >= 0; each term rounded +-0.5 micro
