"""Optimization-round-13 internals: the fused featurizer and the
driver-fold AUC tail must be bit-identical to the compositions they
replaced (the declared queries' oracle hashes are the end-to-end proof;
these pin the primitives in isolation)."""

import pyspark.sql.functions as F


def test_doc_feature_frame_fused_equals_unfused(spark):
    """doc_feature_frame now takes RAW (id, bucket, w) and fuses the L1
    normalization x = floor(w·1e6 / max(Σw, 1)) into its groupBy(id).
    Compare against the pre-r13 composition (separate n1 groupBy + join,
    inlined here) — same buckets, same x doubles, bias element last."""
    from dsci551_edfs_spark.pipeline.classifier import doc_feature_frame

    vecs = spark.createDataFrame(
        [
            (1, 0, 5),
            (1, 3, 7),
            (2, 1, 0),  # all-zero-weight doc: n1 clamps to 1
            (3, 2, 123_456_789),
        ],
        "id long, bucket long, w long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0)],  # id 4: no features at all
        "id long, y long",
    )
    # unfused reference = the former l1_unit_features -> collect_list path
    n1 = vecs.groupBy("id").agg(F.sum("w").alias("n1"))
    xs = vecs.join(n1, "id").select(
        "id",
        "bucket",
        F.floor(F.col("w") * 1e6 / F.greatest(F.col("n1"), F.lit(1)))
        .cast("long")
        .alias("x"),
    )
    want: dict[int, set] = {}
    for r in xs.collect():
        want.setdefault(r["id"], set()).add((r["bucket"], r["x"]))

    rows = doc_feature_frame(vecs, labels).collect()
    assert {r["id"] for r in rows} == {1, 2, 3, 4}
    for r in rows:
        fs = [(e["bucket"], e["x"]) for e in r["fs"]]
        assert fs[-1] == (-1, 100), "bias element must ride last"
        assert set(fs[:-1]) == want.get(r["id"], set()), r["id"]


def test_rank_auc_report_single_job_tail(spark):
    """The AUC tail is now a bounded collect + pure-bigint fold: the
    report off a raw scored frame must equal the replica fold over the
    same grouped counts (including a tie-heavy score column)."""
    from dsci551_edfs_spark.pipeline.evalmetrics import (
        auc_from_grouped_counts,
        rank_auc_report,
    )

    data = [(s % 7, 1 if (s * 13) % 3 == 0 else 0) for s in range(500)]
    df = spark.createDataFrame(data, "s long, y long")
    groups: dict[int, list[int]] = {}
    for s, y in data:
        g = groups.setdefault(s, [0, 0])
        g[0] += 1
        g[1] += y
    want = auc_from_grouped_counts(
        [(s, c, p) for s, (c, p) in groups.items()]
    )
    assert rank_auc_report(df, "s", "y") == want
