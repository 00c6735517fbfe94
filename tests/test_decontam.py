"""Benchmark decontamination (n-gram overlap) tests."""

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.pipeline import decontam as DC


@pytest.fixture(scope="module")
def corpus(spark):
    train = spark.createDataFrame(
        [
            # verbatim copy of bench doc 100 → fully contaminated
            (1, "what is the capital of france paris is the capital"),
            # shares one 3-gram ("the capital of") with bench
            (2, "berlin is the capital of germany and a big city"),
            # no overlap at all
            (3, "spark engines shuffle data across many executors"),
            # short doc (< 3 tokens → single whole-string shingle)
            (4, "two words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris is the capital")],
        "doc_id long, text string",
    )
    return train, bench


def test_overlap_stats(corpus):
    train, bench = corpus
    rows = {
        r["doc_id"]: r
        for r in DC.ngram_overlap_contamination(train, bench).collect()
    }
    assert len(rows) == 4
    # doc 1 is a verbatim copy: every one of its distinct 3-grams overlaps
    assert rows[1]["overlap_ngrams"] == rows[1]["n_ngrams"]
    assert rows[1]["overlap_frac"] == 1.0
    assert rows[1]["contaminated"]
    # doc 2 shares exactly the "is the capital" / "the capital of" grams
    assert 0 < rows[2]["overlap_ngrams"] < rows[2]["n_ngrams"]
    assert rows[2]["contaminated"]
    assert rows[3]["overlap_ngrams"] == 0 and not rows[3]["contaminated"]
    # short doc: one whole-string shingle, no overlap
    assert rows[4]["n_ngrams"] == 1 and not rows[4]["contaminated"]


def test_min_overlap_threshold(corpus):
    train, bench = corpus
    strict = {
        r["doc_id"]: r["contaminated"]
        for r in DC.ngram_overlap_contamination(
            train, bench, min_overlap=5
        ).collect()
    }
    assert strict[1]  # verbatim copy clears any threshold
    assert not strict[2]  # 2 shared grams < 5


def test_decontaminate_removes_flagged(corpus):
    train, bench = corpus
    kept = sorted(
        r["doc_id"] for r in DC.decontaminate(train, bench).collect()
    )
    assert kept == [3, 4]
    # rows pass through with all original columns
    assert DC.decontaminate(train, bench).columns == train.columns


def test_bench_side_is_broadcast(corpus):
    train, bench = corpus
    plan = DC.ngram_overlap_contamination(
        train, bench
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    off = DC.ngram_overlap_contamination(
        train, bench, broadcast_bench=False
    )
    assert off.count() == 4  # shuffle-join fallback stays correct


def test_semantic_decontam_crafted(spark):
    # bench vector along +x; corpus: a verbatim copy (cos=1), a near
    # match at ~45 deg (cos≈0.707), and an orthogonal vector (cos=0)
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),   # same direction, different norm → cos 1.0
            (2, [1.0, 1.0]),   # cos ≈ 0.7071
            (3, [0.0, 5.0]),   # orthogonal → below threshold
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r
        for r in DC.semantic_decontam(corpus, bench, threshold=0.5).collect()
    }
    assert sorted(rows) == [1, 2]  # the orthogonal vector is clean
    assert rows[1]["n_hits"] == 1 and rows[1]["max_cosine"] == 1.0
    assert rows[2]["max_cosine"] == pytest.approx(0.7071, abs=1e-4)


def test_semantic_decontam_counts_multiple_hits(spark):
    # two bench vectors both within threshold of the corpus vector
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.05])], "vec_id long, embedding array<float>"
    )
    row = DC.semantic_decontam(corpus, bench, threshold=0.9).collect()[0]
    assert row["n_hits"] == 2


def test_semantic_decontam_empty_bench(spark):
    bench = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert DC.semantic_decontam(corpus, bench).count() == 0
