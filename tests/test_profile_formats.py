"""Profile operator + I/O format contract tests."""

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.operators.profile import profile
from dsci551_edfs_spark.sources.formats import read_jsonl, write_jsonl
from dsci551_edfs_spark.sources.registry import load_table


def test_profile_one_row_per_column(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 3.5), (2, "b", 1.0)],
        "k long, s string, v double",
    )
    out = {r["column"]: r for r in profile(df, exact_ndv=True).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["s"]["n_nulls"] == 1 and out["v"]["n_nulls"] == 1
    assert out["k"]["ndv"] == 2
    assert out["k"]["min_str"] == "1" and out["k"]["max_str"] == "2"


def test_profile_is_single_job(spark):
    """The whole profile must be ONE aggregate plan (single scan), not a
    per-column job loop."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("range") == 1  # one scan of the source


def test_read_jsonl_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_jsonl(spark, str(tmp_path))


def test_jsonl_roundtrip_types(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dest = str(tmp_path / "docs")
    write_jsonl(docs, dest, n_files=2)
    back = read_jsonl(spark, dest, schema="doc_id long, text string, lang string")
    assert back.schema == docs.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_avro_roundtrip_all_types(spark, tmp_path):
    """Stdlib Avro OCF: every supported Spark type — including nulls,
    negative zigzag values, empty strings, bytes, timestamps — survives
    a distributed write + binaryFile read bit-exact."""
    from datetime import date, datetime

    from dsci551_edfs_spark.sources.avro_stdlib import read_avro, write_avro

    rows = [
        (1, -7, 1.5, float("inf"), "a", True, bytearray(b"\x00\xff"),
         datetime(2024, 1, 2, 3, 4, 5, 123456), date(2024, 2, 29)),
        (-(2**62), None, -0.0, None, "", False, None, None, None),
        (0, 42, 2.25, -3.5, "héllo→", None, bytearray(b""),
         datetime(1969, 12, 31, 23, 59, 59), date(1969, 1, 1)),
    ]
    schema = (
        "l long, i int, d double, f float, s string, b boolean, "
        "raw binary, ts timestamp, dt date"
    )
    df = spark.createDataFrame(rows, schema)
    dest = str(tmp_path / "avro")
    n = write_avro(df.repartition(2), dest)
    assert n == 3
    back = read_avro(spark, dest)
    assert back.schema == df.schema
    got = sorted([tuple(r) for r in back.collect()], key=str)
    want = sorted([tuple(r) for r in df.collect()], key=str)
    assert got == want


def test_avro_roundtrip_table_and_schema_peek(spark, sf_dir, tmp_path):
    from dsci551_edfs_spark.sources.avro_stdlib import read_avro, write_avro

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dest = str(tmp_path / "docs_avro")
    write_avro(docs.repartition(3), dest)
    back = read_avro(spark, dest)  # schema resolved from one-file peek
    assert back.schema == docs.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_avro_rejects_unsupported_types(spark):
    from dsci551_edfs_spark.sources.avro_stdlib import spark_to_avro_schema

    df = spark.createDataFrame([([1, 2],)], "arr array<long>")
    with pytest.raises(TypeError, match="does not map"):
        spark_to_avro_schema(df.schema)


def test_quantiles_exact_vs_approx_rank_error(spark, sf_dir):
    """approx_percentile (the 100 TB sketch path) must land within its
    rank-error contract of the exact PERCENTILE_CONT values."""
    from dsci551_edfs_spark.operators.profile import quantiles
    from dsci551_edfs_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = quantiles(li, "l_extendedprice", probs=(0.5, 0.9)).first()
    approx = quantiles(
        li, "l_extendedprice", probs=(0.5, 0.9), approx=True, accuracy=10000
    ).first()
    vals = sorted(r[0] for r in li.select("l_extendedprice").collect())
    n = len(vals)

    def rank_of(v):
        import bisect

        return bisect.bisect_left(vals, v) / n

    for p, col in ((0.5, "p50"), (0.9, "p90")):
        assert abs(rank_of(approx[col]) - p) <= 0.01  # 100x the 1e-4 bound
        assert exact[col] == pytest.approx(
            sorted(vals)[int(p * (n - 1))], rel=0.01
        )


def test_robust_zscores_match_numpy_and_resist_poisoning(spark):
    """Median/MAD robust z-scores: (a) agree with a direct numpy
    computation, (b) an extreme outlier does NOT drag the scores of
    normal points (the breakdown property the classical z-score lacks)."""
    import numpy as np

    from dsci551_edfs_spark.operators.profile import robust_zscores

    vals = [10, 11, 12, 10, 11, 12, 10, 11, 13, 9]
    poisoned = vals + [100_000]
    rows = [("g", i, v) for i, v in enumerate(poisoned)]
    df = spark.createDataFrame(rows, "grp string, idx long, v long")
    got = {
        r["idx"]: r["rz_micro"]
        for r in robust_zscores(df, ["grp"], "v", carry_cols=("idx",)).collect()
    }
    a = np.array(poisoned, dtype=np.float64)
    med = np.median(a)
    mad = np.median(np.abs(a - med))
    for i, v in enumerate(poisoned):
        expect = round(0.6745 * (v - med) / mad * 1e6)
        assert abs(got[i] - expect) <= 1, (i, v, got[i], expect)
    # normal points stay un-flagged, the outlier is flagged hard
    assert all(abs(got[i]) < 3_500_000 for i in range(len(vals)))
    assert abs(got[len(vals)]) > 3_500_000


def test_robust_zscores_constant_group_null(spark):
    """mad4 == 0 (over half the values identical) → NULL score, row kept."""
    from dsci551_edfs_spark.operators.profile import robust_zscores

    df = spark.createDataFrame(
        [("g", i, 5) for i in range(6)] + [("g", 6, 9)],
        "grp string, idx long, v long",
    )
    rows = robust_zscores(df, ["grp"], "v", carry_cols=("idx",)).collect()
    assert len(rows) == 7
    assert all(r["rz_micro"] is None for r in rows)


def test_correlation_matrix_matches_numpy(spark):
    """The one-scan integer-moment Pearson matrix equals numpy.corrcoef
    on the collected (cents-quantized) data."""
    import numpy as np

    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["correlation_matrix_lineitem"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in rows}
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    data = li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
    m = np.round(np.array([[r[i] for i in range(4)] for r in data]) * 100)
    cc = np.corrcoef(m.T)
    names = ["qty", "price", "disc", "tax"]
    assert len(got) == 6
    for i in range(4):
        for j in range(i + 1, 4):
            assert got[(names[i], names[j])] == pytest.approx(cc[i, j], abs=1e-5)
