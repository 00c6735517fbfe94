"""Temporal joins Spark lacks as built-ins: as-of join and banded range
join, expressed as compositions of existing DataFrame ops (no Python in the
row path).

The reference has no joins at all (SURVEY.md §2.5); these are Spark-native
additions every event/time-series workload needs.

Scale design:
- **as-of join** is the union-window formulation: tag both sides, union,
  and carry the latest right-side payload forward with
  ``last(ignorenulls)`` over (key, ts). ONE shuffle of each input on the
  join key — never a per-row backward scan, never a range cross-product.
  State per task is a single row of carried payload, so it streams through
  a 1000-executor sort without memory pressure. Skewed keys ride on the
  sort-merge machinery + AQE like any other shuffle.
- **range join** buckets the time axis: each right interval explodes to
  the buckets it covers (bounded by ``max_span``), each left point joins
  its single bucket hash-to-hash, then the exact predicate filters. Turns
  the O(N·M) nested-loop Spark would pick for an inequality join into a
  hash join with fanout = interval span / bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_join_point_interval",
    "gap_fill_locf",
    "sessionize",
    "ewma_daily_counts",
]

_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """Parse simple '<N> <unit>' interval specs to seconds."""
    n, unit = spec.strip().split()
    return int(n) * _UNIT_SECONDS[unit.lower()]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right.ts <= left.ts`` (direction='backward'; 'forward' mirrors it)
    sharing the join key — DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    semantics, left-outer flavored (unmatched left rows keep nulls).

    Right-side ties on (key, ts) are broken by the later row in the
    union's sort order; keep right unique per (key, ts) for full
    determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    rts = right_ts_col or ts_col
    # the matched right ts is part of the payload (callers usually want it)
    payload = [c for c in right.columns if c != on]
    renamed = {c: f"{c}{suffix}" for c in payload}

    l_tag = left.select(
        F.col(on),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_rpay"),
    )
    r_tag = right.select(
        F.col(on),
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("_rpay"),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left rows at equal ts so an exact-ts match
        # is visible to the left row
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_rpay", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_rpay", ignorenulls=True).over(w)

    matched = unioned.withColumn("_match", carried).filter(F.col("_is_left") == 1)
    return matched.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(renamed[c]) for c in payload],
    )


def range_join_point_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval containing them
    (``start <= ts < end``) via time-bucket banding.

    Each interval explodes to the buckets it overlaps; each point maps to
    exactly one bucket; the equi-join on bucket is a plain shuffled hash
    join and the precise containment predicate runs post-join. Fanout is
    ceil(span/bucket)+1 rows per interval — pick ``bucket`` near the
    median interval span.
    """
    secs = _interval_seconds(bucket)

    def _bucket_of(df, c):
        col = F.col(c)
        # TIMESTAMP_NTZ (parquet timestamp[us] without tz) can't cast to
        # double directly; hop through TIMESTAMP_LTZ — the session TZ is
        # pinned to UTC (session.py), so the epoch value is unchanged
        if dict(df.dtypes).get(c) == "timestamp_ntz":
            col = col.cast("timestamp")
        return F.floor(col.cast("double") / secs).cast("long")

    p = points.withColumn("_bsec", _bucket_of(points, point_ts))
    iv = intervals.withColumn(
        "_bsec",
        F.explode(
            F.sequence(
                _bucket_of(intervals, start_col), _bucket_of(intervals, end_col)
            )
        ),
    )
    joined = p.join(iv, on="_bsec", how=how).filter(
        (F.col(start_col) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bsec")


def gap_fill_locf(
    observed: DataFrame,
    key_col: str = "series_key",
    ts_col: str = "bucket_ts",
    value_cols: tuple[str, ...] = ("value",),
    step: str = "1 hour",
) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward — the
    TimescaleDB `time_bucket_gapfill` + `locf` contract, composed from
    DataFrame ops.

    ``observed`` has one row per (key, bucket timestamp) with gaps. Each
    key's grid spans ITS OWN min..max bucket at ``step`` resolution —
    ``sequence()`` on the per-key extremes, exploded; a left join lands
    observations on the grid; ``last(ignorenulls)`` over (key, ts) carries
    values across the gaps; ``filled`` marks synthesized rows.

    Scale design:
    - the grid generation is one per-key aggregate + explode — rows
      produced = series length, no cross join with a global calendar;
    - join and window BOTH partition on the series key, so the grid
      shuffle is reused by the fill window (one exchange on a
      1000-executor plan);
    - LOCF state per task = one carried row per value column (same
      union-window machinery as `asof_join`).
    """
    secs = _interval_seconds(step)
    grid = (
        observed.groupBy(key_col)
        .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    "_lo", "_hi", F.expr(f"INTERVAL {secs} SECONDS")
                )
            ).alias(ts_col),
        )
    )
    joined = grid.join(observed, [key_col, ts_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled_flag = F.col(value_cols[0]).isNull().alias("filled")
    out = joined.select(
        key_col,
        ts_col,
        filled_flag,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return out


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: a new session starts after a > ``gap_s``
    silence; session_no = running count of session starts per user. Two
    stacked windows over ONE keyed shuffle (identical partitioning+order,
    Catalyst reuses the exchange and sort) — the batch face of the
    streaming session_window, exact instead of state-store-approximate.

    Scale: the hot-user straggler bound is sort(hot-user rows) — one task
    per user by SEMANTICS (full per-user ordering); salting would break
    exact session numbering. The mitigation is layout, not plan surgery:
    run this over a table bucketed by ``user_col`` (sources/bucketing.py)
    and the window's required hashpartitioning is satisfied by the
    bucketed scan — zero runtime Exchange, the shuffle paid once at
    write time and amortized over every user-keyed query that follows
    (pinned in tests/test_plans.py; measured in SCALE.md)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    run = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        user_col,
        id_col,
        F.sum(new_sess).over(run).cast("long").alias("session_no"),
    )


def ewma_daily_counts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 30,
) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts per
    key (half-life 1 day, window-truncated), computed EXACTLY in
    dyadic-rational integer arithmetic — no floating point anywhere, so
    the result is partitioning-, summation-order- and engine-independent.

    ewma_num(t) = Σ_{j=0..W-1} cnt(t-j) · 2^(W-1-j); the real EWMA is
    ewma_num / 2^(W-1) (one driver-side shift away). Truncation at W days
    discards weight < 2^-W of the tail — below double precision already
    at W=30, so this IS the practically-exact EWMA.

    Scale shape: the raw-event scan collapses FIRST via a map-side-
    combinable groupBy(key, day) — at 100 TB that is the only pass over
    the data, and its output is calendar-sized (keys × days, ~10^5 rows
    for years of data). The W-term weighted window then runs as an
    equi-join on key + day-range filter over that tiny aggregate, a
    ~W× fanout of a calendar-sized frame: driver-negligible at any SF.
    Exactness headroom: ewma_num ≤ 2·2^(W-1)·max(cnt) — with W=30 the
    sum stays under 2^63 while any single key-day count < 2^33 (≈8.6B
    events/key/day); past that, shrink W or widen to decimal(38,0).
    """
    span = window_days - 1
    daily = (
        events.groupBy(
            F.col(key_col).alias("k"),
            F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("day_num"),
        )
        .agg(F.count("*").alias("cnt"))
        # both self-join sides consume the daily aggregate: cut lineage
        # so the RAW scan runs ONCE (plan-pinned in tests/test_plans.py)
        # — at 100 TB the second scan is the whole cost of getting
        # this wrong
        .localCheckpoint(eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    weight = F.expr(
        f"shiftleft(cast(1 as bigint), {span} - cast(a.day_num - b.day_num as int))"
    )
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("b.day_num") >= F.col("a.day_num") - span)
            & (F.col("b.day_num") <= F.col("a.day_num")),
            "inner",
        )
        .groupBy(
            F.col("a.k").alias(key_col),
            F.col("a.day_num").alias("day_num"),
            F.col("a.cnt").alias("cnt"),
        )
        .agg(F.sum(F.col("b.cnt") * weight).alias("ewma_num"))
    )
