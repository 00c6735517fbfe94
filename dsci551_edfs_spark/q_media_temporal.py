"""Streaming-window semantics in batch mode, multimodal binary columns, temporal joins, sketch aggregates.

Split from the original monolithic queries.py (round 13) —
verbatim section move, zero behavior change; registration
still lands in the shared QUERIES/ORACLES dicts via @q.
"""

from __future__ import annotations

from .queries_base import F, MM, TXT, _scratch_dir, _t, os, q

_FLOOR5_SQL = (
    "date_trunc('hour', ts) + INTERVAL (CAST(minute(ts) AS INT) // 5 * 5) MINUTE"
)


@q(
    "events_sliding_window",
    f"""
    SELECT window_start, count(*) AS cnt, round(sum(value), 3) AS sum_value
    FROM (
      SELECT unnest([{_FLOOR5_SQL}, {_FLOOR5_SQL} - INTERVAL 5 MINUTE])
               AS window_start,
             value
      FROM events)
    GROUP BY window_start
    """,
)
def events_sliding_window(spark, sf_dir):
    """10-min windows sliding by 5: every event belongs to exactly 2
    windows (floor5(ts) and floor5(ts)-5min — the oracle states that
    identity explicitly)."""
    from .streaming.windows import sliding_agg

    return sliding_agg(_t(spark, sf_dir, "events"))


@q(
    "events_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, value
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged)
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           count(*) AS cnt,
           round(sum(value), 3) AS sum_value
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def events_session_window(spark, sf_dir):
    """Session windows (5-min gap) per user: Spark's `session_window`
    vs the oracle's gaps-and-islands formulation (new session when the gap
    to the previous event is >= the gap duration; session end = last event
    + gap)."""
    from .streaming.windows import session_agg

    return session_agg(_t(spark, sf_dir, "events"))


@q(
    "events_dedup",
    "SELECT event_id, count(*) AS cnt FROM (SELECT DISTINCT event_id, ts, "
    "user_id, event_type, value, props FROM events) GROUP BY event_id",
)
def events_dedup(spark, sf_dir):
    """Exact event dedup (batch form of dropDuplicatesWithinWatermark):
    distinct full rows, then per-id count."""
    from .streaming.windows import dedup_events

    ev = _t(spark, sf_dir, "events")
    return (
        dedup_events(ev, id_cols=ev.columns)
        .groupBy("event_id")
        .agg(F.count("*").alias("cnt"))
    )


# =====================================================================
# Multimodal columns (pipeline/multimodal.py): opaque binary media +
# typed metadata; decode / features / resize / frame-sample
# =====================================================================

_MM_KIND_SQL = "CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'aud' ELSE 'vid' END"


@q(
    "multimodal_decode",
    f"""
    SELECT doc_id,
           {_MM_KIND_SQL} AS kind,
           CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(16 + doc_id % 32 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 2 + doc_id % 7 ELSE 1 END AS INT)
             AS n_frames,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 4000
                     ELSE 0 END AS INT) AS sample_rate,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    """Binary media container roundtrip: attach (JVM encode/concat) then
    decode (Arrow mapInPandas header parse + payload md5). The oracle
    restates every header field as arithmetic on doc_id and the payload
    hash as md5(text) — byte-for-byte container verification."""
    return MM.decode_media(MM.attach_media(_t(spark, sf_dir, "documents")))


@q(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT doc_id,
             2 + doc_id % 7 AS n_frames,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS plen
      FROM documents WHERE doc_id % 3 = 2
    ), fr AS (
      SELECT doc_id, hx,
             CAST(plen // n_frames AS BIGINT) AS flen,
             unnest(range(0, n_frames, 2)) AS frame_idx
      FROM m
    )
    SELECT doc_id, frame_idx, flen AS frame_bytes,
           md5(substring(hx, 1 + frame_idx * flen * 2, flen * 2)) AS frame_sig
    FROM fr
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Every-2nd-frame sampling of video payloads — pure JVM explode +
    binary substring. Frame fingerprints are md5-over-uppercase-hex on both
    engines (DuckDB cannot slice blobs, so both sides hash the hex text)."""
    return MM.frame_sample(MM.attach_media(_t(spark, sf_dir, "documents")), every=2)


@q(
    "multimodal_resize",
    f"""
    SELECT doc_id,
           {_MM_KIND_SQL} AS kind,
           24 AS width, 24 AS height,
           least(octet_length(encode(text)), 576) AS payload_bytes
    FROM documents
    """,
)
def multimodal_resize(spark, sf_dir):
    """Deterministic fake resize (header rewrite + center-crop payload to
    w*h bytes) verified through the decode stage. payload_md5 excluded:
    the crop can split a multi-byte char, and DuckDB cannot md5 blobs."""
    resized = MM.resize_media(MM.attach_media(_t(spark, sf_dir, "documents")), 24, 24)
    return MM.decode_media(resized).select(
        "doc_id", "kind", "width", "height", "payload_bytes"
    )


@q(
    "multimodal_png_roundtrip",
    """
    SELECT doc_id,
           12 AS px_width, 10 AS px_height,
           CAST(doc_id % 256 AS DOUBLE) AS px_mean
    FROM documents
    """,
)
def multimodal_png_roundtrip(spark, sf_dir):
    """ALL-REAL image pipeline: encode genuine PNGs executor-side (stdlib
    codec — real DEFLATE), resize with use_real=True (decode → resample →
    re-encode), then decode the resized payloads back to pixel stats.
    Every stage is a narrow Arrow mapInPandas pass (no shuffle; media
    bytes never leave their partition). The oracle states the closed form:
    a uniform-shade image keeps its shade through resampling and the
    target dims are 12x10 — so a hash match proves three real codec
    passes ran correctly on every document."""
    from pyspark.sql import types as T

    from dsci551_edfs_spark.pipeline.png_stdlib import png_codec

    media = MM.attach_png_media(_t(spark, sf_dir, "documents"))
    resized = MM.resize_media(media, 12, 10, use_real=True)
    return MM.decode_media(
        resized,
        codec=png_codec,
        codec_fields=[
            T.StructField("px_width", T.IntegerType()),
            T.StructField("px_height", T.IntegerType()),
            T.StructField("px_mean", T.DoubleType()),
        ],
    ).select("doc_id", "px_width", "px_height", "px_mean")


_HIST_ORACLE = """
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx FROM documents
    ), p AS (
      SELECT doc_id, hx,
             unnest(generate_series(1, CAST(length(hx)/2 AS BIGINT))) AS i
      FROM b
    ), e AS (
      SELECT doc_id,
             strpos('0123456789ABCDEF', substring(hx, CAST(2*i-1 AS INT), 1)) - 1 AS hi,
             strpos('0123456789ABCDEF', substring(hx, CAST(2*i AS INT), 1)) - 1 AS lo
      FROM p
    ), agg AS (
      SELECT doc_id,
             {h_cols},
             CAST(sum(hi*16 + lo) AS BIGINT) AS byte_sum
      FROM e GROUP BY doc_id
    )
    SELECT d.doc_id,
           {h_sel},
           CAST(COALESCE(a.byte_sum, 0) AS BIGINT) AS byte_sum
    FROM documents d LEFT JOIN agg a USING (doc_id)
""".format(
    h_cols=", ".join(
        f"count(*) FILTER (WHERE hi={i}) AS h{i}" for i in range(16)
    ),
    h_sel=", ".join(f"COALESCE(a.h{i}, 0) AS h{i}" for i in range(16)),
)


@q("multimodal_byte_histogram", _HIST_ORACLE)
def multimodal_byte_histogram(spark, sf_dir):
    """16-bucket byte histogram + exact byte sum of the payload — the
    feature-extraction stage (numpy bincount inside Arrow batches).

    Output is 16 SCALAR columns h0..h15 (not an array: the driver's pandas
    canonicalizer sorts every column and lists are unhashable) + byte_sum,
    all exact integers so the hash-compare is FP-free. The DuckDB oracle
    rebuilds each payload byte from hex(encode(text)) — high nibble IS the
    16-bucket id — since DuckDB cannot slice blobs directly."""
    h = MM.media_byte_histogram(MM.attach_media(_t(spark, sf_dir, "documents")))
    return h.select(
        "doc_id",
        *[F.col("hist")[i].alias(f"h{i}") for i in range(16)],
        "byte_sum",
    )


# =====================================================================
# Temporal joins (operators/temporal.py): as-of + banded range join
# =====================================================================

@q(
    "asof_join_last_purchase",
    """
    SELECT e.event_id, e.user_id, e.event_type,
           p.ts AS purchase_ts, round(p.value, 3) AS purchase_value
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def asof_join_last_purchase(spark, sf_dir):
    """As-of join: every event picks up the user's most recent purchase at
    or before it. Union-window formulation — one shuffle per side on
    user_id, no range cross-product (oracle: DuckDB native ASOF JOIN)."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        ev.select("event_id", "user_id", "event_type", "ts"),
        purchases,
        on="user_id",
        ts_col="ts",
        suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts_p").alias("purchase_ts"),
        F.round(F.col("value_p"), 3).alias("purchase_value"),
    )


@q(
    "range_join_purchase_hour",
    """
    SELECT p.event_id AS purchase_id, e.event_id, e.event_type
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 10 MINUTE AND e.ts < p.ts
    """,
)
def range_join_purchase_hour(spark, sf_dir):
    """Banded range join: events in the 10 minutes leading up to each
    purchase by the same user. Intervals explode to 10-minute buckets, the
    bucket+user equi-join is a plain hash join, then the exact containment
    predicate filters."""
    from .operators.temporal import range_join_point_interval

    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            (F.col("ts") - F.expr("INTERVAL 10 MINUTE")).alias("start"),
            F.col("ts").alias("end"),
        )
    )
    out = range_join_point_interval(
        ev.select("event_id", "user_id", "event_type", "ts"),
        iv,
        bucket="10 minutes",
    ).filter(F.col("user_id") == F.col("p_user"))
    return out.select("purchase_id", "event_id", "event_type")


@q(
    "stateful_user_stats",
    "SELECT user_id, count(*) AS n_events, round(sum(value), 3) AS sum_value, "
    "max(ts) AS last_ts FROM events GROUP BY user_id",
)
def stateful_user_stats(spark, sf_dir):
    """Batch face of the applyInPandasWithState per-user running stats
    (streaming/stateful.py); the streaming run's final state equals this
    (pinned by test_streaming.py)."""
    from .streaming.stateful import user_running_stats

    out = user_running_stats(_t(spark, sf_dir, "events"))
    return out.withColumn("sum_value", F.round("sum_value", 3))


@q(
    "stream_exactly_once_sink",
    "SELECT event_id, user_id, event_type, value FROM events",
)
def stream_exactly_once_sink(spark, sf_dir):
    """RUNS a real Structured Streaming query (availableNow) through the
    idempotent foreachBatch parquet sink (streaming/sinks.py) and reads
    the landed output back: exactly-once means the sink equals the input
    row-for-row — which is exactly what the oracle states. Replay
    idempotency is additionally pinned in test_streaming.py."""
    from .streaming import sinks as SK
    from .streaming import windows as SW

    ev = _t(spark, sf_dir, "events")
    base = _scratch_dir("eo_sink")
    watch = os.path.join(base, "in")
    ev.repartition(4).write.mode("overwrite").parquet(watch)
    src = SW.stream_from_parquet(spark, watch, ev.schema, max_files=2)
    sq = SK.exactly_once_parquet_sink(
        src, os.path.join(base, "out"), os.path.join(base, "ckpt"), "eo_query"
    )
    if not sq.awaitTermination(300):
        sq.stop()
        raise TimeoutError("exactly-once sink did not finish within 300s")
    return SK.read_exactly_once(spark, os.path.join(base, "out")).select(
        "event_id", "user_id", "event_type", "value"
    )


# =====================================================================
# Sketch aggregates (operators/sketches.py)
# =====================================================================

@q("approx_ndv_orders")  # rows-only: HLL++ estimates have no DuckDB twin
def approx_ndv_orders(spark, sf_dir):
    """HyperLogLog++ distinct counts (rsd=2%) for order keys/customers.
    Error pinned < 5% against exact counts in tests/test_sketches.py."""
    from .operators.sketches import approx_ndv

    return approx_ndv(
        _t(spark, sf_dir, "orders"), ["o_orderkey", "o_custkey"], rsd=0.02
    )


def _hll_own_sql(src: str, group: str, value: str, p: int = 9) -> str:
    """DuckDB replay of the md5-derived HLL (operators/sketches.py:
    hll_own_registers/_estimate): 48-bit hash, low-p-bit bucket,
    descending bit-length CASE for rho, max-register table, harmonic
    estimate with linear-counting correction — every arithmetic step the
    same expression text as the Spark plan, so the doubles agree
    bit-for-bit (dyadic-rational register sum; the one ln() is absorbed
    by round-3 on both sides)."""
    m = 1 << p
    w_bits = 48 - p
    rho = (
        "CASE "
        + " ".join(
            f"WHEN w >= {1 << (b - 1)} THEN {w_bits - b + 1}"
            for b in range(w_bits, 0, -1)
        )
        + f" ELSE {w_bits + 1} END"
    )
    raw = f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0 / (s + ({m} - c))"
    return f"""
    WITH hx AS (
      SELECT {group} AS g,
             CAST('0x' || substring(md5(CAST({value} AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
      FROM {src}
    ),
    wx AS (SELECT g, h & {m - 1} AS bucket, h >> {p} AS w FROM hx),
    r AS (SELECT g, bucket, max({rho}) AS reg FROM wx GROUP BY 1, 2),
    a AS (SELECT g, sum(pow(2.0, -reg)) AS s, count(*) AS c
          FROM r GROUP BY 1)
    SELECT g, round(CASE WHEN {raw} <= {2.5 * m} AND ({m} - c) > 0
                         THEN {m}.0 * ln({m}.0 / ({m} - c))
                         ELSE {raw} END, 3) AS ndv_est
    FROM a
    """


@q(
    "hll_own_ndv",
    f"""
    WITH est AS ({_hll_own_sql("orders", "o_orderpriority", "o_custkey")}),
    ex AS (SELECT o_orderpriority AS g,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_exact
           FROM orders GROUP BY 1)
    SELECT est.g AS o_orderpriority, est.ndv_est, ex.ndv_exact
    FROM est JOIN ex USING (g) ORDER BY 1
    """,
)
def hll_own_ndv(spark, sf_dir):
    """Oracle-checked HyperLogLog: per-priority distinct-customer
    estimates from the md5-derived register table
    (operators/sketches.py:hll_own_registers — the fully-verifiable twin
    of the Datasketches `approx_ndv_orders`, whose opaque binary
    sketches stay rows-only by nature), reported next to the exact NDV
    so the error is visible in the result itself."""
    from .operators import sketches as SK

    orders = _t(spark, sf_dir, "orders")
    regs = SK.hll_own_registers(orders, "o_custkey", ["o_orderpriority"])
    est = SK.hll_own_estimate(regs, ["o_orderpriority"])
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("ndv_exact")
    )
    return est.join(exact, "o_orderpriority").orderBy("o_orderpriority")


@q(
    "hll_own_rollup",
    f"""
    WITH wk AS (
      SELECT (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week, user_id
      FROM events),
    est AS ({_hll_own_sql("wk", "week", "user_id")})
    SELECT g AS week, ndv_est FROM est ORDER BY week
    """,
)
def hll_own_rollup(spark, sf_dir):
    """Lossless sketch mergeability, PROVED by the oracle: Spark builds
    per-DAY register tables and max-merges them to weeks; DuckDB builds
    the week registers directly from the raw events. Registers agree
    exactly iff max-merge is lossless (max over day partitions == max
    over the week), so the hash match IS the mergeability proof — the
    property `ndv_daily_to_weekly` (Datasketches union) can only pin in
    pytest."""
    from .operators import sketches as SK

    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
        "user_id",
    )
    day_regs = SK.hll_own_registers(ev, "user_id", ["day_num"])
    week_regs = (
        day_regs.withColumn("week", F.expr("day_num div 7"))
        .groupBy("week", "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )
    return SK.hll_own_estimate(week_regs, ["week"]).orderBy("week")


@q(
    "frequent_event_types",
    """
    SELECT event_type, cnt, share FROM (
      SELECT event_type, count(*) AS cnt,
             round(count(*) / (SELECT count(*) FROM events), 4) AS share
      FROM events GROUP BY event_type)
    WHERE share >= 0.01 ORDER BY cnt DESC, event_type LIMIT 20
    """,
)
def frequent_event_types(spark, sf_dir):
    """Heavy hitters over event_type at >= 1% support."""
    from .operators.sketches import frequent_items

    return frequent_items(_t(spark, sf_dir, "events"), "event_type", 0.01, 20)


_NTOK_SQL = (
    "CAST(CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS BIGINT)"
)


@q(
    "quality_filter",
    rf"""
    WITH s AS (
      SELECT doc_id,
             {_NTOK_SQL} AS n_tokens,
             round(length(text) / greatest({_NTOK_SQL}, 1), 3) AS avg_token_len,
             round(len(regexp_extract_all(text, '[^\w\s]'))
                   / greatest(length(text), 1), 3) AS punct_ratio,
             round(len(regexp_extract_all(text, '[0-9]'))
                   / greatest(length(text), 1), 3) AS digit_ratio
      FROM documents)
    SELECT doc_id, n_tokens, avg_token_len, punct_ratio, digit_ratio,
           round(least(n_tokens / 100.0, 1.0) * (1 - punct_ratio)
                 * (1 - digit_ratio), 4) AS quality_score
    FROM s
    WHERE n_tokens >= 10 AND punct_ratio <= 0.20 AND digit_ratio <= 0.30
      AND avg_token_len BETWEEN 2.0 AND 12.0
    """,
)
def quality_filter(spark, sf_dir):
    """Composite corpus quality gate: text_stats thresholds + monotone
    quality score — the first pass of a training-data pipeline."""
    return TXT.quality_filter(_t(spark, sf_dir, "documents"))


# =====================================================================
# Additional TPC-H shapes: semi-join EXISTS (Q4), scan-agg (Q6),
# correlated scalar subquery (Q17) — Catalyst subquery decorrelation
# =====================================================================

