"""Skew-resilient join: key salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at runtime
by splitting oversized shuffle partitions, but it cannot split a SINGLE
hot key's hash bucket when one key dominates (the web-corpus "null user" /
boilerplate-fingerprint shape). Salting does: explode the hot key into S
sub-keys on the build side, scatter the probe side uniformly across the
same S salts, join on (key, salt).

Cost model: the build (small) side is replicated S times FOR HOT KEYS
ONLY; non-hot keys join salt-0 to salt-0 with zero overhead. Probe rows
never replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "top_keys"]


def top_keys(df: DataFrame, key: str, n: int = 10, min_count: int = 1000) -> list:
    """The candidate hot-key list: top-n keys by frequency above a floor.
    One cheap partial-aggregated count — run it on a sample at 100 TB."""
    rows = (
        df.groupBy(key)
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc())
        .limit(n)
        .collect()
    )
    return [r[key] for r in rows]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: list,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `left` (large, skewed) to `right` (smaller) on `key`, salting
    only the keys in `hot_keys`.

    left rows with a hot key get a random salt in [0, salts); right rows
    with a hot key are replicated to every salt; everything else uses
    salt 0 on both sides. The join key becomes (key, _salt) — the hot
    key's rows now land on `salts` reducers instead of one.
    """
    hot = F.array(*[F.lit(k) for k in hot_keys])
    is_hot_l = F.array_contains(hot, F.col(key))
    l_salted = left.withColumn(
        "_salt",
        F.when(is_hot_l, (F.rand(seed=7) * salts).cast("int")).otherwise(F.lit(0)),
    )
    is_hot_r = F.array_contains(hot, F.col(key))
    r_salted = right.withColumn(
        "_salts",
        F.when(is_hot_r, F.sequence(F.lit(0), F.lit(salts - 1))).otherwise(
            F.array(F.lit(0))
        ),
    ).withColumn("_salt", F.explode("_salts")).drop("_salts")
    out = l_salted.join(r_salted, on=[key, "_salt"], how=how)
    return out.drop("_salt")
