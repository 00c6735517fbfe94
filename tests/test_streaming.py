"""Structured Streaming: the streaming run of each windowed operator must
equal its batch run over the same input (the oracle chain is then
streaming == batch == DuckDB SQL)."""

import os
import tempfile

import pytest

from dsci551_edfs_spark.sources.registry import load_table
from dsci551_edfs_spark.streaming import windows as SW

SCRATCH = "/root/repo/.scratch/test_streaming"


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir):
    """Events re-written as a multi-file parquet dir (micro-batched by the
    file source) with a proper TimestampType column."""
    os.makedirs(SCRATCH, exist_ok=True)
    d = tempfile.mkdtemp(dir=SCRATCH)
    load_table(spark, sf_dir, "events").repartition(6).write.mode("overwrite").parquet(d)
    return d


def _batch(spark, d):
    return spark.read.parquet(d)


def _stream(spark, d):
    schema = spark.read.parquet(d).schema
    return SW.stream_from_parquet(spark, d, schema, max_files=2)


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_tumbling_equals_batch(spark, event_dir):
    batch = SW.tumbling_agg(_batch(spark, event_dir))
    stream = SW.run_available_now(
        SW.tumbling_agg(_stream(spark, event_dir)), "tumbling_t"
    )
    assert _as_sets(stream) == _as_sets(batch)
    assert len(_as_sets(batch)) > 0


def test_streaming_sliding_equals_batch(spark, event_dir):
    batch = SW.sliding_agg(_batch(spark, event_dir))
    stream = SW.run_available_now(
        SW.sliding_agg(_stream(spark, event_dir)), "sliding_t"
    )
    assert _as_sets(stream) == _as_sets(batch)


def test_streaming_session_equals_batch(spark, event_dir):
    # unbounded watermark: files arrive in arbitrary ts order, and session
    # merging must see every event for strict batch equivalence
    batch = SW.session_agg(_batch(spark, event_dir))
    stream = SW.run_available_now(
        SW.session_agg(_stream(spark, event_dir), watermark="3650 days"), "session_t"
    )
    assert _as_sets(stream) == _as_sets(batch)


def test_streaming_dedup(spark, event_dir):
    # duplicate the input stream by unioning it with itself: dedup must
    # collapse it back to the original row count
    ev = _batch(spark, event_dir)
    dup_dir = tempfile.mkdtemp(dir=SCRATCH)
    ev.union(ev).write.mode("overwrite").parquet(dup_dir)
    schema = ev.schema
    stream = SW.dedup_events(
        SW.stream_from_parquet(spark, dup_dir, schema), id_cols=["event_id"]
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_t").count()
    assert got == ev.count()


def test_watermark_drops_late_rows(spark, event_dir):
    """Rows older than the watermark horizon must be dropped: feed the main
    data in batch 1, advance the watermark, then deliver year-old events in
    batch 2."""
    import glob
    import shutil

    import pyspark.sql.functions as F

    ev = _batch(spark, event_dir)
    watch = tempfile.mkdtemp(dir=SCRATCH)
    stage = tempfile.mkdtemp(dir=SCRATCH)

    def deliver(df, tag):
        out = os.path.join(stage, tag)
        df.coalesce(1).write.mode("overwrite").parquet(out)
        for i, f in enumerate(glob.glob(os.path.join(out, "*.parquet"))):
            shutil.copy(f, os.path.join(watch, f"{tag}_{i}.parquet"))

    deliver(ev, "main")
    src = spark.readStream.schema(ev.schema).parquet(watch)
    agg = SW.tumbling_agg(src, watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark → max(ts) - 10min
        deliver(ev.withColumn("ts", F.col("ts") - F.expr("INTERVAL 365 DAYS")), "late")
        q.processAllAvailable()  # batch 2: every row is a year late
    finally:
        q.stop()
    out = spark.table("late_t")
    assert out.filter(F.col("window_start") < "2023-06-01").count() == 0


def test_stateful_running_stats_equals_batch(spark, event_dir):
    """applyInPandasWithState final state per user == batch groupBy."""
    from pyspark.sql import functions as F

    from dsci551_edfs_spark.streaming import stateful as ST

    ev = _batch(spark, event_dir)
    batch = ST.user_running_stats(ev)
    stream = ST.run_stateful_update(
        ST.user_running_stats(_stream(spark, event_dir)), "stateful_t"
    )
    b = {r["user_id"]: r for r in batch.collect()}
    s = {r["user_id"]: r for r in stream.collect()}
    assert set(b) == set(s)
    for uid in b:
        assert s[uid]["n_events"] == b[uid]["n_events"]
        assert s[uid]["sum_value"] == pytest.approx(b[uid]["sum_value"])
        assert s[uid]["last_ts"] == b[uid]["last_ts"]


def test_stream_stream_interval_join_equals_batch(spark, event_dir):
    """Two watermarked streams joined on key + time range == batch join."""
    import pyspark.sql.functions as F

    from dsci551_edfs_spark.streaming.windows import interval_join

    def split(df):
        purchases = df.filter("event_type = 'purchase'").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        views = df.filter("event_type = 'view'").select(
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("ts_r"),
            F.col("event_id").alias("view_id"),
        )
        return purchases, views

    bp, bv = split(_batch(spark, event_dir))
    batch = interval_join(bp, bv).select("purchase_id", "view_id")

    sp, sv = split(_stream(spark, event_dir))
    # unbounded watermark for exact equivalence: availableNow delivers
    # files in arbitrary ts order
    joined = interval_join(sp, sv, watermark="3650 days").select(
        "purchase_id", "view_id"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = spark.table("ssj_t")
    assert _as_sets(stream) == _as_sets(batch)
    assert batch.count() > 0


def test_parquet_sink_with_checkpoint(spark, event_dir):
    """File sink + checkpoint: exactly-once delivery to parquet; restarting
    the query against the same checkpoint must not duplicate rows."""
    import tempfile

    ev = _batch(spark, event_dir)
    out = tempfile.mkdtemp(dir=SCRATCH)
    ckpt = tempfile.mkdtemp(dir=SCRATCH)

    def run():
        q = (
            _stream(spark, event_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(out).count() == ev.count()
    run()  # restart on the same checkpoint: no new input -> no duplicates
    assert spark.read.parquet(out).count() == ev.count()


def test_stream_static_enrich_equals_batch(spark, event_dir):
    """Stream-static broadcast join: the streaming run (append mode, no
    state) must equal the batch join row-for-row."""
    from pyspark.sql import functions as F

    dim = (
        _batch(spark, event_dir)
        .select("user_id").distinct()
        .withColumn("tier", F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")))
    )
    batch = SW.static_enrich(_batch(spark, event_dir), dim).select(
        "event_id", "user_id", "tier"
    )
    enriched = SW.static_enrich(_stream(spark, event_dir), dim).select(
        "event_id", "user_id", "tier"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream = spark.table("enrich_t")
    assert _as_sets(stream) == _as_sets(batch)
