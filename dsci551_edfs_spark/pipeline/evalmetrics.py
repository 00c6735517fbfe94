"""Exact classifier evaluation: tie-corrected ROC-AUC (Mann-Whitney
rank-sum) and step PR-AUC (average precision) over frozen-integer
scores — the one number every data-quality gate decision is made on
(which classifier, which threshold, is the rule gate good enough).

Exactness discipline (classifier.py precedent): scores arrive as
integers (the ×1e4-frozen sigmoid `p4`, or any bounded integer score),
every intermediate is an exact integer — DOUBLED midranks keep the
tie-corrected rank-sum integral, per-threshold precision freezes at
micro units via round-half-up bigint division — so a DuckDB oracle
restates the whole computation and hash-matches, and a pure-Python
property replica replays it on random tied score vectors.

Scale posture (100 TB): the corpus collapses FIRST through ONE
map-side-combinable groupBy(score) — bounded at the score domain
(≤10001 rows for p4), the only full pass over the data. Both
cumulative legs (count and positives) then ride ONE two-phase
range-partitioned running-totals pass (`operators/cumulative.py` —
no single-partition window), the totals frame is a broadcast scalar
crossJoin, and the final division happens on the driver over a
1-row collect. All driver-side arithmetic is arbitrary-precision
Python int; all in-plan products are DECIMAL(38,0)-guarded (the
r11 `aqp_sampled_revenue` int64-headroom lesson: Σ pos·midrank ~ 2n²
overflows int64 past n ≈ 2e9).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.cumulative import running_totals
from .dedup import _persist

__all__ = [
    "rank_auc_report",
    "rank_auc_from_grouped",
    "auc_from_counts",
    "auc_from_grouped_counts",
]

_DEC = "decimal(38,0)"


def rank_auc_report(
    scored: DataFrame, score_col: str = "s", label_col: str = "y"
) -> tuple[int, int, int, int]:
    """(n_pos, n_neg, roc_auc_micro, pr_auc_micro) for an integer score
    column against a 0/1 label — exact end to end.

    ROC-AUC is the Mann-Whitney statistic with integer midranks:
    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg), carried DOUBLED
    (mr2 = 2·midrank) so ties stay integral. PR-AUC is step average
    precision over descending score thresholds: each tied block of
    pos_s positives contributes (pos_s/n_pos)·(cum_pos≥s/cum_cnt≥s),
    with the block precision frozen at micro units by round-half-up
    bigint division. Both land as round-half-up micro integers.

    Edge cases: an all-negative corpus reports (0, 0) — no positives,
    nothing to rank; an all-positive corpus reports ROC 0 (undefined,
    no negative to compare) and PR 1e6 (every threshold is pure). A
    constant score gives ROC-AUC exactly 500000 via the midrank
    correction.
    """
    g = _persist(
        scored.groupBy(F.col(score_col).alias("s")).agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(label_col).cast("long").alias("pos"),
        )
    )
    out = rank_auc_from_grouped(g)
    g.unpersist()
    return out


def rank_auc_from_grouped(g: DataFrame) -> tuple[int, int, int, int]:
    """(n_pos, n_neg, roc_auc_micro, pr_auc_micro) from a PRE-GROUPED
    (s, cnt, pos) frame — the in-plan tail of `rank_auc_report`,
    exposed so adversarial fixtures can feed counts far past what raw
    rows could materialize (cnt ~ 1e14 blocks push Σ pos·midrank to
    ~1e30, deep into the DECIMAL(38,0)-guard regime the r11
    `aqp_sampled_revenue` overflow lesson says bites at scale first).
    ``g`` should be persisted/settled by the caller if it is expensive:
    it is consumed by three jobs (totals, offsets collect, final agg)."""
    rt = running_totals(
        g, ["s"], [("cnt", "cum_cnt"), ("pos", "cum_pos")]
    )
    tot = g.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("np"),
    )
    term = rt.crossJoin(F.broadcast(tot)).select(
        F.col("pos").cast(_DEC).alias("pos"),
        # doubled midrank of the tied block ending at cum_cnt
        (2 * (F.col("cum_cnt") - F.col("cnt")) + F.col("cnt") + 1)
        .cast(_DEC)
        .alias("mr2"),
        # ≥-this-score cumulatives (descending-threshold leg)
        (F.col("n") - F.col("cum_cnt") + F.col("cnt"))
        .cast(_DEC)
        .alias("ge_cnt"),
        (F.col("np") - F.col("cum_pos") + F.col("pos"))
        .cast(_DEC)
        .alias("ge_pos"),
    )
    row = (
        term.select(
            "pos",
            "mr2",
            # block precision at micro units, round-half-up:
            # (2e6·ge_pos + ge_cnt) div (2·ge_cnt)
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * ge_pos + ge_cnt)"
                " div (2 * ge_cnt)"
            ).alias("prec_micro"),
        )
        .agg(
            F.sum(F.col("pos") * F.col("mr2")).cast(_DEC).alias("r2"),
            F.sum(F.col("pos") * F.col("prec_micro"))
            .cast(_DEC)
            .alias("psum"),
            F.sum("pos").cast("long").alias("np"),
        )
        .crossJoin(F.broadcast(tot.select("n")))
        .first()
    )
    n = int(row["n"] or 0)
    np_ = int(row["np"] or 0)
    nn = n - np_
    r2 = int(row["r2"] or 0)
    psum = int(row["psum"] or 0)
    return np_, nn, *auc_from_counts(r2, psum, np_, nn)


def auc_from_counts(
    r2: int, psum: int, n_pos: int, n_neg: int
) -> tuple[int, int]:
    """(roc_auc_micro, pr_auc_micro) from the exact integer sums —
    doubled rank-sum of positives ``r2`` and Σ pos·prec_micro ``psum``
    — via round-half-up arbitrary-precision division (the bounded
    driver-side step; identical formulas in the DuckDB oracle)."""
    if n_pos <= 0 or n_neg < 0:
        return 0, 0
    # AUC = (r2 − np(np+1)) / (2·np·nn), round-half-up at micro
    roc = (
        (10**6 * (r2 - n_pos * (n_pos + 1)) + n_pos * n_neg)
        // (2 * n_pos * n_neg)
        if n_neg > 0
        else 0
    )
    # AP = psum / np at micro units, round-half-up
    pr = (2 * psum + n_pos) // (2 * n_pos)
    return roc, pr


def auc_from_grouped_counts(
    groups: list[tuple[int, int, int]]
) -> tuple[int, int, int, int]:
    """Pure-Python replica over [(score, cnt, pos)] — the property-test
    reference (mirrors rank_auc_report exactly, no Spark)."""
    groups = sorted(groups)
    n = sum(c for _, c, _ in groups)
    np_ = sum(p for _, _, p in groups)
    nn = n - np_
    cum_cnt = cum_pos = 0
    r2 = psum = 0
    for _, cnt, pos in groups:
        cum_cnt += cnt
        cum_pos += pos
        mr2 = 2 * (cum_cnt - cnt) + cnt + 1
        ge_cnt = n - cum_cnt + cnt
        ge_pos = np_ - cum_pos + pos
        prec_micro = (2_000_000 * ge_pos + ge_cnt) // (2 * ge_cnt)
        r2 += pos * mr2
        psum += pos * prec_micro
    return np_, nn, *auc_from_counts(r2, psum, np_, nn)
