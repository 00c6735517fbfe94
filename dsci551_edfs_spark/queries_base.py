"""Registry core for the query catalog (round-13 split): the
QUERIES/ORACLES dicts, the @q decorator, and the shared loader
helpers every per-family module imports. The catalog itself lives
in the q_* family modules; `queries.py` is the facade that imports
them all and re-exports the full surface.

Every implemented operator is exposed as a
(spark, sf_dir) -> DataFrame callable, with a DuckDB oracle SQL string
where the semantics are ANSI-SQL-expressible.

This is the driver-facing inventory for SURVEY.md §2 plus the
training-data-pipeline operators. Naming contract: every computed column is
aliased IDENTICALLY in the Spark plan and the oracle SQL (the driver's
compare hashes values after sorting columns by name).

FP policy: aggregates whose accumulation order differs between engines
(sums/avgs over many doubles) are rounded to a fixed scale ON BOTH SIDES;
integer-derived and exact values are left unrounded.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import memo as MEMO
from .functions import text as TXT
from .pipeline import dedup as DD
from .pipeline import multimodal as MM
from .pipeline import similarity as SIM
from .sources import ingest as ING
from .sources import scan as SCN
from .sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

SCRATCH = "/root/repo/.scratch"


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _scratch_dir(tag: str) -> str:
    os.makedirs(SCRATCH, exist_ok=True)
    return tempfile.mkdtemp(prefix=f"{tag}_", dir=SCRATCH)


# =====================================================================
# §2.2 PMR aggregates (reference parity: combined_flask.py:549-802)
# =====================================================================

