"""MERGE INTO (upsert) as a pure DataFrame composition — the Delta/Iceberg
``MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` semantics over
plain tables.

Spark SQL has no MERGE against parquet; lakehouses implement it as a
join-and-rewrite. That join-and-rewrite IS the operator here, engine-side:

    merged = target ⟕ source (full outer on key)
      matched        → source values win (the UPDATE branch)
      source-only    → insert
      target-only    → carry through unchanged

Scale notes:
- One shuffle per side on the merge key — identical cost to the
  lakehouse implementation before file-level pruning; with both sides
  bucketed on the key (sources/bucketing.py) the exchanges vanish.
- The rewrite is columnar and null-safe: each output column is
  ``coalesce(source.c, target.c)`` only for UPDATE columns; key columns
  come from ``coalesce(source.key, target.key)``.
- ``_merge_action`` ('update' | 'insert' | 'keep') is emitted for audit —
  the row-level ledger a production MERGE writes to its commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_into", "scd2_from_changes", "snapshot_diff", "asof_snapshot"]


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: list[str] | None = None,
    dedupe_source: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``key``: matched rows take the
    source's ``update_cols`` (default: every non-key source column),
    unmatched source rows insert, unmatched target rows persist. Returns
    the merged table plus ``_merge_action``.

    PRECONDITION: ``source`` must be unique on ``key`` — duplicate source
    keys would fan the target row out (real MERGE raises 'multiple source
    rows matched' here). ``dedupe_source=True`` enforces it by keeping ONE
    deterministic row per key (lexicographic struct-min over the non-key
    columns — a whole row, never a column-wise mash-up) before joining."""
    if dedupe_source:
        others = [c for c in source.columns if c != key]
        packed = source.groupBy(key).agg(F.min(F.struct(*others)).alias("_s"))
        source = packed.select(
            key, *[F.col(f"_s.{c}").alias(c) for c in others]
        )
    if update_cols is None:
        update_cols = [c for c in source.columns if c != key]
    missing = [c for c in update_cols if c not in target.columns]
    if missing:
        raise ValueError(f"update_cols not in target: {missing}")
    s = source.select(
        F.col(key).alias("_sk"),
        *[F.col(c).alias(f"_s_{c}") for c in update_cols],
    )
    t = target.withColumnRenamed(key, "_tk")
    joined = t.join(s, F.col("_tk") == F.col("_sk"), "full_outer")
    action = (
        F.when(F.col("_tk").isNull(), F.lit("insert"))
        .when(F.col("_sk").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    out_cols = [F.coalesce("_tk", "_sk").alias(key)]
    for c in target.columns:
        if c == key:
            continue
        if c in update_cols:
            out_cols.append(F.coalesce(f"_s_{c}", c).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols, action.alias("_merge_action"))


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: turn a change stream (one row per
    version) into validity intervals — ``valid_from`` = the row's own
    timestamp, ``valid_to`` = the NEXT version's timestamp (null while
    current), ``version`` = 1-based ordinal, ``is_current``.

    One window partitioned by the business key (never unpartitioned):
    state per task is one lead row, so a 100 TB change history
    sessionizes in a single keyed shuffle — the same shape as the as-of
    join's union-window. ``tiebreak`` orders same-timestamp versions
    deterministically (defaults to the key itself being unique per ts)."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two table versions keyed by ``key``:
    ``change`` ∈ added | removed | changed | unchanged, with the key and
    both sides' compared values carried for audit. The
    what-did-this-pipeline-run-touch report (a lakehouse commit diff on
    plain tables).

    One full-outer join on the key — same single-shuffle shape as
    `merge_into`; with both snapshots bucketed on the key the exchange
    vanishes. Null-safe comparison (`eqNullSafe`) so NULL→value edits
    count as changes."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c != key]
    o = old.select(
        F.col(key).alias("_ok"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("_nk"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, F.col("_ok") == F.col("_nk"), "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_ok").isNull(), F.lit("added"))
        .when(F.col("_nk").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.coalesce("_ok", "_nk").alias(key),
        change.alias("change"),
        *[F.col(f"_o_{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"_n_{c}").alias(f"new_{c}") for c in compare_cols],
    )


def asof_snapshot(
    scd2: DataFrame,
    as_of,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """TIME TRAVEL over an SCD2 dimension: the table state AS OF a
    timestamp is exactly the rows whose validity interval covers it —
    ``valid_from <= t < coalesce(valid_to, +inf)``. One row per key by
    construction (intervals partition each key's timeline), zero shuffle:
    the filter composes onto the SCD2 plan and — when the dimension is
    stored partitioned/z-ordered on the interval columns — prunes to the
    files overlapping ``t``. The lakehouse `VERSION AS OF` read
    re-expressed over interval columns instead of a commit log."""
    t = F.lit(as_of).cast("timestamp")
    return scd2.filter(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )
