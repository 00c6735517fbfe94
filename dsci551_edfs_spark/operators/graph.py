"""Iterative graph analytics on DataFrames: integer-exact PageRank.

Connected components (HashMin BSP) lives in pipeline/dedup.py; this module
adds the other canonical iterative algorithm. The twist that makes it
ORACLE-CHECKABLE — rare for iterative float algorithms — is integer
arithmetic throughout: ranks live in micro-units (1e6 = mass 1.0) and
every division is floor division, so the result is bit-identical on any
engine and any partitioning, with zero FP accumulation-order dependence
(same design as pipeline/importance.py and pipeline/lm.py).

Update rule per iteration (all integer ops):

    contrib(u)  = pr(u) // outdeg(u)
    pr'(v)      = (15·SCALE) // (100·N)  +  (85·Σ contrib(u→v)) // 100

Scale shape: each iteration is one shuffle of (dst, contrib) pairs
grouped by destination — the textbook Pregel/GraphX message pattern; the
rank vector is (node, long) rows, never collected. Iterations extend the
lineage, so the loop localCheckpoints the rank vector every 5 rounds
exactly like connected_components does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_micro", "SCALE"]

SCALE = 1_000_000


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list (every node must appear as a
    src or dst; dangling nodes simply leak their mass like the classic
    formulation). Returns (node, pr_micro) after ``iterations`` rounds
    from the uniform start SCALE // N."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # two consumers per iteration + the N count: pin the small frames
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_micro: cannot rank an empty edge list")
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    teleport = (15 * SCALE) // (100 * n)
    pr = nodes.withColumn("pr", F.lit(SCALE // n).cast("long"))
    for it in range(iterations):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("pr") / F.col("deg")).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("sc"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.floor(85 * F.coalesce(F.col("sc"), F.lit(0)) / 100)
            )
            .cast("long")
            .alias("pr"),
        )
        # cut lineage every 5 rounds: without this a high iteration
        # count grows the plan tree exponentially in analysis time
        # (each pr embeds the previous pr twice via join+select)
        if (it + 1) % 5 == 0 and (it + 1) < iterations:
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node", F.col("pr").alias("pr_micro"))
