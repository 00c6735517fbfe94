"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
- `brute_force_topk`: exact cosine top-k. The query side is BROADCAST
  (queries ≪ corpus in every retrieval workload), so the corpus is scanned
  once with zero shuffle of the vectors; only (query_id, id, score) rows —
  24 bytes each — shuffle into the per-query top-k. At 100 TB the scan is
  embarrassingly parallel and the top-k is a TakeOrdered per query key.
- `ivf_topk`: IVF-style pruning — corpus pre-bucketed by nearest of C
  centroids (one pass), queries probe only `n_probe` nearest buckets. The
  candidate set shrinks ~C/n_probe-fold; same broadcast + top-k tail.

Scoring is pure JVM expression (zip_with/aggregate on unit-normalized
vectors → dot == cosine).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, normalize

__all__ = ["brute_force_topk", "kmeans_centroids", "build_ivf_index", "ivf_topk"]


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k with a deterministic (score desc, id) order."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank", "score")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the normalized queries, one corpus
    scan, per-query top-k. Returns (query_id, neighbor_id, rank, score)."""
    c = corpus.select(
        F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), normalize(as_double(vec_col)).alias("qv")
    )
    joined = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "id", dot(F.col("v"), F.col("qv")).alias("score")
    )
    return _rank_topk(scored, k)


def _nearest_centroids(
    df: DataFrame, cents: np.ndarray, vec_col: str, n_top: int = 1
) -> DataFrame:
    """Append a `centroid` column = nearest of C centroids (n_top=1), or
    explode into the n_top nearest (similarity-descending) per row.

    The centroid matrix travels as ONE Spark broadcast and every Arrow
    batch is assigned with a single BLAS matmul — same pattern as the
    RP-LSH plane assignment in `dedup.embedding_dup_pairs`. The previous
    formulation embedded C·dim `F.lit` literals in the plan: fine at
    8×64, but a quarter-million-literal plan (and per-row interpreted
    dot-product trees) at a production 256×1024 index."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(cents, dtype=np.float64)
    )
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", centroid int"
    )
    n_c = cents.shape[0]
    k = min(n_top, n_c)

    def assign(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = m @ C.T
            if k == 1:
                idx = sims.argmax(axis=1)[:, None]
            else:
                part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
                order = np.take_along_axis(-sims, part, axis=1).argsort(axis=1)
                idx = np.take_along_axis(part, order, axis=1)
            out = pdf.loc[pdf.index.repeat(k)].reset_index(drop=True)
            out["centroid"] = idx.reshape(-1).astype(np.int32)
            yield out

    return df.mapInPandas(assign, out_schema)


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_fraction: float | None = None,
    dim: int | None = None,
) -> np.ndarray:
    """Spherical k-means (Lloyd) over unit vectors, distributed per
    iteration: assignment is one broadcast-matmul argmax per Arrow batch
    (`_nearest_centroids`); the update is posexplode →
    groupBy(cluster, dim) avg — a shuffle of (cluster, dim) partial sums,
    never of vectors. Init = random directions (seeded), so iters=0
    degrades to the static index.

    At 100 TB pass `sample_fraction`: centroids fit on a sample, the full
    corpus only ever pays the one assignment pass in build_ivf_index."""
    unit = corpus.select(normalize(as_double(vec_col)).alias("v"))
    if sample_fraction:
        unit = unit.sample(fraction=sample_fraction, seed=seed)
    if dim is None:  # probe only when the caller can't tell us
        dim = unit.select(F.size("v").alias("d")).first()["d"]
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_centroids, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(iters):
        assigned = _nearest_centroids(unit, cents, "v").select(
            "v", F.col("centroid").alias("c")
        )
        means = (
            assigned.select("c", F.posexplode("v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cents.copy()  # empty clusters keep their direction
        acc: dict[int, np.ndarray] = {}
        for r in means:
            acc.setdefault(r["c"], np.zeros(dim))[r["pos"]] = r["m"]
        for c, vec in acc.items():
            n = np.linalg.norm(vec)
            if n > 0:
                new[c] = vec / n
        cents = new
    return cents


def build_ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Assign each corpus vector to its nearest of C centroids — fixed
    random directions by default (deterministic from seed), or pass
    `centroids` from `kmeans_centroids` for data-adaptive buckets; the
    query path is identical either way. Returns (bucketed corpus,
    centroids).

    The bucketed corpus should be persisted `partitionBy('centroid')` in a
    real deployment so a probe reads only its bucket directories."""
    if centroids is not None:
        cents = centroids
        n_centroids = cents.shape[0]
    else:
        if dim is None:
            dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
        rng = np.random.RandomState(seed)
        cents = rng.standard_normal((n_centroids, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    unit = corpus.select(
        F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
    )
    bucketed = _nearest_centroids(unit, cents, "v")
    return bucketed, cents


def ivf_topk(
    bucketed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe the n_probe nearest centroid buckets per query; exact cosine
    within candidates. Join key = centroid id (small int) → the corpus side
    can be partition-pruned on it."""
    q = queries.select(
        F.col(id_col).alias("query_id"), normalize(as_double(vec_col)).alias("qv")
    )
    probes = _nearest_centroids(q, centroids, "qv", n_top=n_probe)
    joined = bucketed.join(F.broadcast(probes), on="centroid")
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "id", dot(F.col("v"), F.col("qv")).alias("score")
    )
    return _rank_topk(scored, k)
