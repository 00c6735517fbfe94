"""EDFS-Spark: a PySpark-native analytics engine with the query surface of
Aman04jdsj/dsci551_EDFS (emulated-HDFS + partition-based map-reduce),
re-designed Spark-first and extended with a full relational layer and
large-scale training-data-pipeline operators.

See SURVEY.md for the reference blueprint and per-module docstrings for
file:line parity citations.
"""

from .session import get_spark

__all__ = ["get_spark"]
