"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check at sf0.001.
`queries()` — every implemented operator from SURVEY.md §2 (+ the
training-data-pipeline ops) as (spark, sf_dir) -> DataFrame callables.
`oracle_sql()` — DuckDB-equivalent SQL per query where SQL-expressible
(hash-family/LSH ops are rows-only by design; see each docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dsci551_edfs_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's PMR path (put→hash-partition→pruned
    aggregate, SURVEY.md §3.2) expressed as a grouped Catalyst aggregate
    over sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
