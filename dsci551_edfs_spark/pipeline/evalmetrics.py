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
(≤10001 rows for p4), the only full pass over the data. The tail —
both cumulative legs, the midrank/precision products and the final
round-half-up divisions — is then a single-pass fold over that
score-domain-bounded frame in arbitrary-precision Python int on the
driver (optimization r13: it was previously a two-phase
range-partitioned running-totals pass + broadcast-totals crossJoin +
DECIMAL(38,0)-guarded aggregate — 4 extra Spark jobs per leg, every
one of them over a ≤10001-row frame; a bounded collect + exact bigint
fold computes the identical integers in zero extra jobs, the same
bounded-collect class as the ≤65-row model collects). Σ pos·midrank
~ 2n² overflows int64 past n ≈ 2e9, which is exactly why the fold
uses Python bigints — strictly wider headroom than the previous
in-plan DECIMAL(38,0) guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# bounded-collect guard cap (score domain is ≤10001 for p4; see
# plans/guards.py)
_AUC_COLLECT_CAP = 1_000_000

__all__ = [
    "rank_auc_report",
    "rank_auc_from_grouped",
    "auc_from_counts",
    "auc_from_grouped_counts",
]


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
    return rank_auc_from_grouped(
        scored.groupBy(F.col(score_col).alias("s")).agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(label_col).cast("long").alias("pos"),
        )
    )


def rank_auc_from_grouped(g: DataFrame) -> tuple[int, int, int, int]:
    """(n_pos, n_neg, roc_auc_micro, pr_auc_micro) from a PRE-GROUPED
    (s, cnt, pos) frame. The frame is score-domain-bounded by
    construction (≤10001 rows for p4), so the whole tail is ONE bounded
    collect + the exact bigint fold `auc_from_grouped_counts` — no
    running-totals shuffle, no per-leg aggregate jobs, and Python-int
    headroom covers adversarial counts (cnt ~ 1e14 blocks push
    Σ pos·midrank to ~1e30) with no DECIMAL ceiling at all."""
    from ..plans.guards import collect_bounded

    # the fold sorts by the score value, so a non-integral score column
    # would be silently TRUNCATED by int() — distinct scores inside one
    # integer collapse/misorder and the AUC is wrong with no error
    # (ADVICE r13, medium). All in-repo callers pass frozen integer
    # scores; assert that instead of guessing.
    s_type = dict(g.dtypes)["s"]
    if s_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"rank_auc_from_grouped: score column must be integral "
            f"(frozen-integer score contract), got {s_type}"
        )
    rows = collect_bounded(
        g.select("s", "cnt", "pos"),
        cap=_AUC_COLLECT_CAP,  # score-domain-bounded (≤10001 for p4)
        what="rank_auc_from_grouped",
    )
    return auc_from_grouped_counts(
        [(int(r["s"]), int(r["cnt"] or 0), int(r["pos"] or 0)) for r in rows]
    )


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
