"""Per-corpus memo store (dsci551_edfs_spark/memo.py): deterministic
paths, build-once/reload-forever, corpus-version invalidation, and the
cross-SparkSession survival that DataFrame-valued caches lacked."""

import os

import pytest

from dsci551_edfs_spark import memo as MEMO


@pytest.fixture()
def scratch(tmp_path, monkeypatch):
    monkeypatch.setattr(MEMO, "SCRATCH", str(tmp_path))
    MEMO.BUILD_SECONDS.clear()
    return str(tmp_path)


def test_memo_path_deterministic_and_version_sensitive(scratch, sf_dir):
    p1 = MEMO.memo_path("t", sf_dir, ["region"])
    assert p1 == MEMO.memo_path("t", sf_dir, ["region"])
    assert p1 != MEMO.memo_path("t", sf_dir, ["region"], version=2)
    assert p1 != MEMO.memo_path("t", sf_dir, ["nation"])
    assert p1.startswith(os.path.join(scratch, "memo"))


def test_fingerprint_tracks_source_mtime(scratch, sf_dir, tmp_path):
    # a copied corpus dir with touched mtimes fingerprints differently
    import shutil

    alt = tmp_path / "alt_sf"
    alt.mkdir()
    src = os.path.join(sf_dir, "region.parquet")
    dst = str(alt / "region.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    os.utime(dst, (1, 1))
    assert MEMO.corpus_fingerprint(sf_dir, ["region"]) != MEMO.corpus_fingerprint(
        str(alt), ["region"]
    )


def test_dataframe_memo_builds_once_then_reloads(scratch, spark, sf_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "node")

    df1 = MEMO.dataframe_memo(spark, "five", sf_dir, ["region"], build)
    assert MEMO.BUILD_SECONDS["five"] > 0
    df2 = MEMO.dataframe_memo(spark, "five", sf_dir, ["region"], build)
    assert calls == [1]  # second call served from disk
    assert sorted(r["node"] for r in df2.collect()) == [0, 1, 2, 3, 4]
    assert df1.schema == df2.schema


def test_dataframe_memo_served_across_build_failure_cleanup(
    scratch, spark, sf_dir
):
    # a failed build leaves no ready memo; the next build succeeds
    def bad():
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        MEMO.dataframe_memo(spark, "flaky", sf_dir, ["region"], bad)
    assert not MEMO.is_ready(MEMO.memo_path("flaky", sf_dir, ["region"]))
    out = MEMO.dataframe_memo(
        spark, "flaky", sf_dir, ["region"], lambda: spark.range(2)
    )
    assert out.count() == 2


def test_layout_memo_markers_gate_readiness(scratch, spark, sf_dir):
    def build(tmp):
        spark.range(3).write.parquet(os.path.join(tmp, "a"))
        spark.range(4).write.parquet(os.path.join(tmp, "b"))

    path = MEMO.layout_memo(
        "lay", sf_dir, ["region"], build, markers=("a/_SUCCESS", "b/_SUCCESS")
    )
    assert MEMO.BUILD_SECONDS["lay"] > 0
    assert spark.read.parquet(os.path.join(path, "b")).count() == 4
    MEMO.BUILD_SECONDS.clear()
    path2 = MEMO.layout_memo(
        "lay", sf_dir, ["region"], build, markers=("a/_SUCCESS", "b/_SUCCESS")
    )
    assert path2 == path and MEMO.BUILD_SECONDS["lay"] == 0.0


def test_stale_fingerprint_pruned_same_corpus_only(scratch, spark, sf_dir, tmp_path):
    """Regenerated test data changes the fingerprint → the superseded
    memo is GC'd on the next build; memos of the SAME tag for OTHER
    corpora (tests sf0.001 / gate sf0.01 / bench sf0.1 coexist) are
    never touched."""
    import shutil as _sh

    # a second corpus with the same table but different mtime
    alt = tmp_path / "sfalt"
    alt.mkdir()
    src = os.path.join(sf_dir, "region.parquet")
    dst = str(alt / "region.parquet")
    (_sh.copytree if os.path.isdir(src) else _sh.copy)(src, dst)

    build = lambda: spark.range(3)  # noqa: E731
    p_main = MEMO.memo_path("gc", sf_dir, ["region"])
    p_alt = MEMO.memo_path("gc", str(alt), ["region"])
    MEMO.dataframe_memo(spark, "gc", sf_dir, ["region"], build)
    MEMO.dataframe_memo(spark, "gc", str(alt), ["region"], build)
    assert MEMO.is_ready(p_main) and MEMO.is_ready(p_alt)

    # "regenerate" the alt corpus: new mtime → new fingerprint → rebuild
    os.utime(dst, (2, 2))
    p_alt2 = MEMO.memo_path("gc", str(alt), ["region"])
    assert p_alt2 != p_alt
    MEMO.dataframe_memo(spark, "gc", str(alt), ["region"], build)
    assert MEMO.is_ready(p_alt2)
    assert not os.path.exists(p_alt)  # stale version of SAME corpus GC'd
    assert MEMO.is_ready(p_main)  # other corpus untouched


def test_load_table_plan_cache_identity(spark, sf_dir):
    """load_table resolves a table to ONE DataFrame per (session,
    sf_dir, table) — the r9 plan cache that removed ~0.1 s of py4j
    re-resolution per mention across the bench suite."""
    from dsci551_edfs_spark.sources.registry import load_table

    a = load_table(spark, sf_dir, "nation")
    b = load_table(spark, sf_dir, "nation")
    assert a is b
    c = load_table(spark, sf_dir, "region")
    assert c is not a
    # a different sf_dir spelling of the same path still hits (abspath
    # normalization)
    d = load_table(spark, sf_dir.rstrip("/") + "/", "nation")
    assert d is a


def test_spread_small_parallelizes_single_partition(spark, sf_dir):
    """spread_small fans a tiny (one-split-sized) frame out to default
    parallelism and leaves LARGE frames untouched (no extra shuffle at
    scale). Since optimization r14 the small/large decision comes from
    Catalyst's sizeInBytes estimate vs maxPartitionBytes — not from a
    df.rdd.getNumPartitions() probe, which cost a full plan→RDD
    conversion on the driver per call (guide §7.3, the r13
    derive_rank_partitions fix applied to this helper's many callers)."""
    from dsci551_edfs_spark.plans.hints import spread_small

    one = spark.range(100).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    sp = spread_small(one)
    assert sp.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sp.count() == 100
    # estimate 8 B/row × 3e8 rows ≈ 2.4 GB ≥ parallelism/4 input splits
    # at the default 128 MB split size for any parallelism ≤ 75: stays
    # untouched without ever planning an RDD (plan-only assertion)
    wide = spark.range(300_000_000).repartition(
        spark.sparkContext.defaultParallelism
    )
    assert spread_small(wide) is wide
