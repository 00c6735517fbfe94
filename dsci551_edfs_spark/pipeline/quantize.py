"""Embedding quantization — the storage/bandwidth lever for 100 TB
vector corpora.

Per-vector symmetric int8 quantization (the FAISS ``SQ8``/llama.cpp
``Q8_0`` family): ``scale = max|x| / 127``, ``q_i = round(x_i / scale)``
in [-127, 127]. A float32 corpus shrinks 4x (plus one double per
vector), which at 100 TB is the difference between spilling and fitting
executor memory during similarity joins; int8 dot products also engage
SIMD on modern JVMs.

Everything is a JVM array expression (``transform`` / ``zip_with`` /
``aggregate``) — no Python, no UDF. The reconstruction-error profile
reduces each vector's squared-error terms as EXACT INTEGER picos
(``round(err² · 1e12)`` as int64): element order inside an array fold is
stable, but shuffle-level sums are not, and integer sums are
order-independent — the same cross-engine determinism policy as
``pipeline.importance`` (see its module docstring for the observed
double-accumulation divergence).

Quantized search (``topk_int8``) runs the same broadcast-queries /
single-corpus-scan shape as ``similarity.brute_force_topk`` but with
integer multiply-adds in the inner loop; its recall against the exact
path is pinned in tests, not SQL-oracled (the int8 rounding is
implementation-defined behavior the oracle would just restate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, normalize

__all__ = ["quantize_embeddings", "quantization_error", "topk_int8"]


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id_col, dim, scale, qvec): per-vector symmetric int8 quantization.
    All-zero vectors get scale 1.0 (and an all-zero qvec) so downstream
    dequantization never divides by zero."""
    v = as_double(vec_col)
    maxabs = F.array_max(F.transform(v, F.abs))
    base = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.when(maxabs == 0.0, F.lit(1.0))
        .otherwise(maxabs / F.lit(127.0))
        .alias("scale"),
    )
    return base.select(
        id_col,
        F.size("_v").cast("long").alias("dim"),
        "scale",
        F.transform(
            "_v", lambda x: F.round(x / F.col("scale")).cast("int")
        ).alias("qvec"),
    )


def quantization_error(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id_col, dim, scale_r, sq_err_pico, mse, max_abs_err): per-vector
    int8 reconstruction-error profile. ``sq_err_pico`` is the exact
    integer Σ round(errᵢ²·1e12); ``mse`` divides it back out — identical
    int64 in, identical double out on any engine."""
    q = quantize_embeddings(df, vec_col, id_col).join(
        df.select(F.col(id_col), as_double(vec_col).alias("_v")), id_col
    )
    err = F.zip_with(
        "_v", "qvec", lambda x, qi: x - qi.cast("double") * F.col("scale")
    )
    pico = F.aggregate(
        F.transform(err, lambda e: F.round(e * e * F.lit(1e12)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return q.select(
        id_col,
        "dim",
        F.round("scale", 9).alias("scale_r"),
        pico.alias("sq_err_pico"),
        # no rounding: identical int64 pico / identical doubles divide to
        # bit-identical doubles on every engine, while rounding at a
        # decimal half (dim is a power of two) is half-mode-dependent
        (pico / F.lit(1e12) / F.col("dim")).alias("mse"),
        F.round(F.array_max(F.transform(err, F.abs)), 9).alias("max_abs_err"),
    )


def topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Quantized brute-force top-k: both sides int8, inner loop is an
    integer dot product; scores dequantize by the two scales at the end.
    Same broadcast + single-scan + per-query TakeOrdered shape as the
    exact path — only the per-element cost (and 4x the scan bytes)
    changes. Vectors are unit-normalized BEFORE quantization so the
    dequantized integer dot approximates cosine and ranks compare
    directly against `similarity.brute_force_topk`. Returns
    (query_id, neighbor_id, rank, score)."""

    def _norm_q(df: DataFrame):
        return quantize_embeddings(
            df.select(
                F.col(id_col), normalize(as_double(vec_col)).alias(vec_col)
            ),
            vec_col,
            id_col,
        )

    c = _norm_q(corpus).select(
        F.col(id_col).alias("id"),
        F.col("qvec").alias("cv"),
        F.col("scale").alias("c_scale"),
    )
    qn = _norm_q(queries).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        F.col("scale").alias("q_scale"),
    )
    joined = c.join(F.broadcast(qn), F.lit(True))
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    idot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        "query_id",
        "id",
        (idot * F.col("c_scale") * F.col("q_scale")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank", "score")
    )
