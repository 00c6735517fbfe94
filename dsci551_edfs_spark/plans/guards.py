"""Driver-safety guard for the bounded-collect pattern.

Optimization r13 replaced several all-small-data Spark tails (running
totals, largest-remainder self-joins, sequential argmax passes) with
ONE driver collect + an exact Python fold — correct because each input
frame is bounded by CONSTRUCTION (a groupBy over the ≤10001-value score
domain, mixture-source keys, a sliced MMR pool). The r13 verdict's
standing objection (item 7): those bounds were documented, not
enforced — a future caller feeding an unbounded key column would get a
driver OOM instead of an error.

``collect_bounded`` enforces the contract in the same single job the
collect already paid: ``limit(cap + 1)`` bounds what the driver can
ever hold (a LocalLimit per partition feeds a single-partition
GlobalLimit, so executors ship at most cap+1 rows), and one extra row
past the cap raises with the violating site named. When the input
really is within the cap, ``limit`` returns every row, in the same
partition-order concatenation a bare ``collect`` produces — and every
caller's fold is row-order-insensitive anyway (each one sorts or
reduces). Caps are set 2-4 orders of magnitude above each site's
structural bound: generous enough to never trip on a legitimate input,
small enough that the guarded collect stays a few hundred MB of driver
memory instead of an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row

__all__ = ["collect_bounded"]


def collect_bounded(df: DataFrame, cap: int, what: str) -> list[Row]:
    """Collect ``df`` asserting it holds at most ``cap`` rows; raise
    ``ValueError`` naming ``what`` otherwise. One job, driver memory
    bounded at cap+1 rows even when the contract is violated."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: bounded-collect contract violated — input exceeds "
            f"{cap} rows; this tail is driver-folded only for "
            f"key/score-domain-bounded frames (see plans/guards.py)"
        )
    return rows
