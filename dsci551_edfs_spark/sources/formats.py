"""I/O format surface beyond the reference's CSV-only world.

The reference ingests and emits CSV text exclusively
(`combined_flask.py:343`, `:316`). A training-data pipeline additionally
needs JSONL (the lingua franca of crawl/corpus interchange) and Parquet
(the engine-native format). These are thin, schema-explicit wrappers —
the point is the CONTRACT (explicit schema on read, compression on write,
partition-count control) rather than novel code.

Scale notes:
- JSONL reads NEED an explicit schema at scale: schema inference is a
  full extra pass over 100 TB. `read_jsonl` therefore takes schema
  (sample-infer only when explicitly asked).
- Text formats (CSV/JSONL) are row-oriented and uncompressible-columnar;
  they exist at the pipeline EDGES. Everything internal stays Parquet:
  column pruning + predicate pushdown + page-level min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
    "read_orc",
    "write_orc",
]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON. Pass a schema; `infer=True` opts into
    the extra inference pass (fine at test scale, wrong at 100 TB)."""
    if schema is None and not infer:
        raise ValueError(
            "read_jsonl requires an explicit schema (or infer=True): schema "
            "inference is a full extra scan of the input"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame, path: str, n_files: int | None = None, compression: str = "gzip"
) -> None:
    """Write newline-delimited JSON, gzip by default (JSONL is an edge
    format — always compressed in transit)."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").option("compression", compression).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", header).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC — the other columnar interchange format (Hive-ecosystem
    exports). Self-describing schema, predicate pushdown and column
    pruning work exactly as with Parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zlib") -> None:
    df.write.mode("overwrite").option("compression", compression).orc(path)
