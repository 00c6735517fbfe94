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
from ..plans.hints import spread_small

# bounded-collect guard cap for mmr_select's candidate pool (contract:
# ≤ pool_hi - pool_lo + 2 rows; see plans/guards.py)
_MMR_COLLECT_CAP = 100_000

__all__ = [
    "brute_force_topk",
    "knn_classify",
    "kmeans_centroids",
    "build_ivf_index",
    "ivf_topk",
    "save_ivf_index",
    "load_ivf_index",
    "ivf_topk_pruned",
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
    "mutual_knn_hamming",
    "mutual_knn_hamming_bucketed",
    "margin_knn_filter",
    "mmr_select",
    "hbos_outlier_scores",
]


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
    # single-row-group corpora arrive as ONE partition, serializing the
    # scoring scan on one core (plans.hints.spread_small; no-op at scale)
    c = spread_small(corpus).select(
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


def _sign_word_sql(col: str, dim: int = 64) -> str:
    """SQL expression packing the SIGNS of a <=64-dim vector into one
    BIGINT word: bit i set iff component i > 0. Bit 63 lands as the
    signed min-long addend (two's complement; DuckDB refuses 1<<63, so
    the oracle uses the identical literal). A SQL string, not a Column
    tree — 64 terms would be ~300 py4j calls (see minhash_sig_expr).

    Vectors LONGER than ``dim`` raise at scan time (`raise_error` branch)
    instead of silently quantizing only the first ``dim`` components — a
    degradation both engines would agree on, so no oracle could catch it.
    The guard is a per-row codegen comparison, not an extra job."""
    terms = " + ".join(
        f"(CASE WHEN {col}[{i}] > 0 THEN "
        + (
            "CAST(-9223372036854775808 AS BIGINT)"
            if i == 63
            else f"CAST({1 << i} AS BIGINT)"
        )
        + " ELSE CAST(0 AS BIGINT) END)"
        for i in range(dim)
    )
    return (
        f"CASE WHEN size({col}) > {dim} THEN CAST(raise_error("
        f"concat('binary sign-pack supports <= {dim} dims; got ', "
        f"cast(size({col}) as string))) AS BIGINT) ELSE ({terms}) END"
    )


def binary_sign_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """1-bit sign-quantized ANN — the extreme point of the int8 → PQ →
    binary quantization ladder: each <=64-dim vector compresses to ONE
    int64 word (64x smaller than float64), candidates rank by Hamming
    distance = bit_count(xor), ties broken by neighbor id. Returns
    (query_id, neighbor_id, rank, hamming).

    Scale shape: the packed corpus is 16 bytes/row — the representation
    a trillion-vector coarse filter actually scans; the word scan is one
    codegen projection + broadcast of the packed queries, and a real
    deployment reranks the top-k' survivors with exact cosine (compose
    with `brute_force_topk` over the candidate ids). Signs are taken on
    the RAW components (normalization never flips a sign), so the
    packing is exact integer arithmetic and the whole ranking is
    SQL-oracle-able.

    The packed corpus is PINNED (16 bytes/row): without the barrier,
    CollapseProject inlines the 64-term sign CASE into the per-pair
    bit_count projection and the pack re-evaluates once per (row, query)
    instead of once per row — the r9 map-side-fold lesson. A production
    deployment stores the packed words as the index; the pin is the
    demo-scale stand-in for that."""
    from .dedup import _persist

    c = _persist(
        spread_small(corpus).select(
            F.col(id_col).alias("id"),
            F.expr(_sign_word_sql(vec_col)).alias("w"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(_sign_word_sql(vec_col)).alias("qw"),
    )
    joined = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "id",
        F.bit_count(F.col("w").bitwiseXOR(F.col("qw"))).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            "rank",
            "hamming",
        )
    )


def binary_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    coarse_k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The two-stage shape a production binary index actually runs:
    `binary_sign_topk`'s Hamming scan keeps the top ``coarse_k``
    candidates per query (16 bytes/vector — the only thing the full
    corpus scan touches), then ONLY those candidates are re-scored with
    exact cosine and re-ranked to the final ``k``. Returns
    (query_id, neighbor_id, rank, score).

    Scale: the float vectors are fetched for |queries|·coarse_k rows —
    an id-keyed join against the corpus, never a second full scan; the
    re-rank window is per-query over coarse_k rows. Recall vs the exact
    scan is pinned in pytest (`test_binary_rerank_recall`)."""
    cand = binary_sign_topk(
        corpus, queries, k=coarse_k, vec_col=vec_col, id_col=id_col
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        normalize(as_double(vec_col)).alias("v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        normalize(as_double(vec_col)).alias("qv"),
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("neighbor_id").alias("id"),
            dot(F.col("v"), F.col("qv")).alias("score"),
        )
    )
    return _rank_topk(scored, k)


def mutual_knn_hamming(
    a_side: DataFrame,
    b_side: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Mutual (reciprocal) k-NN pairs between two corpora in 1-bit
    Hamming space — the candidate stage of bitext / parallel-pair mining
    (Artetxe & Schwenk 2019 mine translation pairs as mutual neighbors
    between the two languages' embedding sets): keep (a, b) only if b is
    in a's forward top-k AND a is in b's backward top-k. Mutuality kills
    hubs — a vector that is everyone's neighbor survives only toward the
    few it reciprocates. Returns
    (id_a, id_b, rank_ab, rank_ba, hamming).

    Hamming distance is SYMMETRIC, so both directions' rankings come
    from ONE pair scan: score every (a, b) pair once (16 bytes/vector,
    codegen bit_count), then rank the same frame twice — partitioned by
    the a-side for the forward rank and by the b-side for the backward
    rank — and keep rows inside both top-k's. No reversed-pair join, no
    second scan. The PACKED sides are pinned before the join: without
    the barrier, CollapseProject inlines the 64-term sign CASE into the
    per-PAIR bit_count projection — measured 15.7 s vs 1.2 s on the
    demo (the r9 map-side-fold lesson again); pinned, each side is
    16 bytes/row — pack-once IS the representation a binary index
    stores. The scan broadcasts the a-side; when both corpora are too
    big to broadcast, swap it for the banded signature join
    (`simhash_pairs`' chunk pigeonhole over the same packed words) —
    the ranking/mutuality tail is unchanged."""
    from .dedup import _persist

    a = _persist(
        a_side.select(
            F.col(id_col).alias("id_a"),
            F.expr(_sign_word_sql(vec_col)).alias("wa"),
        )
    )
    b = _persist(
        b_side.select(
            F.col(id_col).alias("id_b"),
            F.expr(_sign_word_sql(vec_col)).alias("wb"),
        )
    )
    pairs = b.join(F.broadcast(a), F.lit(True)).select(
        "id_a",
        "id_b",
        F.bit_count(F.col("wa").bitwiseXOR(F.col("wb"))).alias("hamming"),
    )
    return _mutual_rank_filter(pairs, k)


def _mutual_rank_filter(pairs: DataFrame, k: int) -> DataFrame:
    """The reciprocity tail shared by the exact and bucketed mutual-kNN
    paths: rank the (id_a, id_b, hamming) pair frame twice — forward by
    a-side, backward by b-side, deterministic (hamming, id) tiebreak —
    and keep rows inside both top-k's."""
    w_ab = Window.partitionBy("id_a").orderBy(
        F.col("hamming").asc(), F.col("id_b").asc()
    )
    w_ba = Window.partitionBy("id_b").orderBy(
        F.col("hamming").asc(), F.col("id_a").asc()
    )
    return (
        pairs.withColumn("rank_ab", F.row_number().over(w_ab))
        .withColumn("rank_ba", F.row_number().over(w_ba))
        .filter((F.col("rank_ab") <= k) & (F.col("rank_ba") <= k))
        .select("id_a", "id_b", "rank_ab", "rank_ba", "hamming")
    )


def mutual_knn_hamming_bucketed(
    a_side: DataFrame,
    b_side: DataFrame,
    k: int = 5,
    bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The sub-quadratic scale twin of `mutual_knn_hamming`: Hamming-
    prefix (banded-signature) blocking replaces the all-pairs scan, the
    reciprocity tail is unchanged. The 64-bit sign word splits into
    ``bands`` equal bit-bands; a pair becomes a CANDIDATE only if some
    band matches exactly — the pigeonhole guarantee that every pair at
    Hamming distance < ``bands`` survives blocking, and anything
    farther survives only by band collision. Ranks are computed WITHIN
    the candidate set (the honest ANN semantics — same contract as
    `knn_label_vote_ivf` vs `knn_label_vote`); the planted-twin recall
    contract pins that true near-pairs are never lost
    (tests/test_round12_ops.py).

    Scale: each side explodes to ``bands`` (band, key) rows and the
    candidate stage is a KEY-SHUFFLED equi-join on (band, key) — no
    broadcast of either corpus, no |A|x|B| pair frame; expected
    candidates ~ |A||B|·bands/2^(64/bands) for uncorrelated bits, and a
    skewed band key degrades to AQE skew-join, not a crossJoin. Band
    extraction is (w >> 16i) & 0xFFFF — arithmetic shift + mask is
    bit-identical in Spark and DuckDB (both two's complement), so the
    WHOLE path is oracle-restatable, bands included."""
    from .dedup import _persist

    width = 64 // bands
    mask = (1 << width) - 1
    a = _persist(
        a_side.select(
            F.col(id_col).alias("id_a"),
            F.expr(_sign_word_sql(vec_col)).alias("wa"),
        )
    )
    b = _persist(
        b_side.select(
            F.col(id_col).alias("id_b"),
            F.expr(_sign_word_sql(vec_col)).alias("wb"),
        )
    )

    def banded(df: DataFrame, idc: str, wc: str) -> DataFrame:
        bk = F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(i).cast("long").alias("band"),
                        F.shiftright(F.col(wc), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                )
            )
        ).alias("bk")
        return df.select(idc, wc, bk).select(
            idc, wc, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )

    cand = (
        banded(a, "id_a", "wa")
        .join(banded(b, "id_b", "wb"), ["band", "key"])
        .select("id_a", "id_b", "wa", "wb")
        .distinct()
    )
    pairs = cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("wa").bitwiseXOR(F.col("wb"))).alias("hamming"),
    )
    return _mutual_rank_filter(pairs, k)


def margin_knn_filter(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 4,
    threshold_milli: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Ratio-margin scoring of each query's best match (Artetxe &
    Schwenk 2019): margin(x, y) = cos(x, y) / ((avgNNk(x) + avgNNk(y)) / 2)
    — "how much closer is y than x's and y's OTHER neighbors". The
    standard mined-pair filter: absolute cosine thresholds fail under
    hubness (dense regions score everything high); the margin
    renormalizes by local density. Returns
    (query_id, neighbor_id, margin_milli) for best matches with
    margin >= threshold_milli / 1000.

    Arithmetic contract: cosines quantize to integer MICRO units
    (floor(1e6·c + 0.5) — double accumulation error is ~1e-15 relative,
    nine orders below the quantum), the k-sums are exact int64, and the
    margin is one bigint division — so the whole score is restatable in
    SQL and hash-matches, like the retrieval metrics.

    Scale shape: two corpus scans, each broadcasting a small side — the
    queries, then their distinct best matches (≤ |queries| rows). The
    per-query rank is the same partial-WindowGroupLimit tail as the ANN
    scans."""
    cm_micro = F.floor(
        F.lit(1e6)
        * (
            dot(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn"))
        )
        + F.lit(0.5)
    ).cast("long")

    def side(df, prefix):
        from ..functions.vectors import norm

        return df.select(
            F.col(id_col).alias(f"{prefix}id"),
            as_double(vec_col).alias(f"{prefix}v"),
            norm(as_double(vec_col)).alias(f"{prefix}n"),
        )

    c = side(corpus, "c")

    def knn(qdf):
        scored = (
            c.join(F.broadcast(side(qdf, "q")), F.lit(True))
            .filter(F.col("cid") != F.col("qid"))
            .select(
                F.col("qid").alias("query_id"),
                F.col("cid").alias("id"),
                cm_micro.alias("cm"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cm").desc(), F.col("id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    from .dedup import _persist

    # qn has THREE consumers (ax, top1, and top1-derived nbr_ids inside
    # ay's broadcast) — unpinned, each re-runs the Q·N scan + window
    qn = _persist(knn(queries))
    ax = qn.groupBy("query_id").agg(F.sum("cm").alias("ax"))
    top1 = qn.filter(F.col("rank") == 1).select("query_id", "id", "cm")
    nbr_ids = top1.select(F.col("id").alias(id_col)).distinct()
    nbrs = corpus.join(F.broadcast(nbr_ids), id_col, "left_semi")
    ay = (
        knn(nbrs)
        .groupBy("query_id")
        .agg(F.sum("cm").alias("ay"))
        .select(F.col("query_id").alias("id"), "ay")
    )
    margin = (
        top1.join(ax, "query_id")
        .join(F.broadcast(ay), "id")
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.expr(f"(2000 * {k} * cm) div (ax + ay)").alias("margin_milli"),
        )
    )
    return margin.filter(F.col("margin_milli") >= threshold_milli)


def _nearest_centroids(
    df: DataFrame,
    cents: np.ndarray,
    vec_col: str,
    n_top: int = 1,
    with_rank: bool = False,
) -> DataFrame:
    """Append a `centroid` column = nearest of C centroids (n_top=1), or
    explode into the n_top nearest (similarity-descending) per row;
    ``with_rank`` additionally emits the 1-based `probe_rank` of each
    exploded centroid (nearest = 1) for probe-budget sweeps.

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
        + (", probe_rank int" if with_rank else "")
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
                # STABLE sort of -sims = (sim desc, centroid-id asc):
                # exactly the oracle's ORDER BY sim DESC, c — equal-sim
                # centroids must rank identically in both engines, which
                # argpartition + unstable argsort did not guarantee
                idx = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            out = pdf.loc[pdf.index.repeat(k)].reset_index(drop=True)
            out["centroid"] = idx.reshape(-1).astype(np.int32)
            if with_rank:
                out["probe_rank"] = np.tile(
                    np.arange(1, k + 1, dtype=np.int32), len(pdf)
                )
            yield out

    return df.mapInPandas(assign, out_schema)


def ivf_recall_curve(
    bucketed: DataFrame,
    centroids: np.ndarray,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The nprobe-tuning sweep every IVF deployment runs before serving:
    recall@k and candidate cost per probe budget, against the exact
    brute-force ground truth — from ONE candidate scan.

    Each query's buckets are ranked once up to max(probes); every
    candidate row carries the probe_rank of its bucket, so the whole
    grid is a broadcast-grid join + filter over the SAME scored frame —
    sweeping 4 budgets costs one corpus pass plus the (tiny) per-budget
    rank/aggregate tail, not 4 index probes. The ground truth is one
    brute-force pass (already the recall harness elsewhere). Returns
    ``(n_probe, n_candidates, avg_candidates, n_hits, recall_at_k)``.

    At 100 TB this is how the nprobe knob is actually chosen: run the
    sweep on a bounded query sample against a corpus slice, read the
    recall/cost elbow, ship the budget."""
    max_p = max(probes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        normalize(as_double(vec_col)).alias("qv"),
    )
    pr = _nearest_centroids(q, centroids, "qv", n_top=max_p, with_rank=True)
    cand = (
        bucketed.join(F.broadcast(pr), on="centroid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            "id",
            "probe_rank",
            dot(F.col("v"), F.col("qv")).alias("score"),
        )
    )
    from .dedup import _persist

    cand = _persist(cand)  # consumed by the sweep join AND the count agg
    spark = bucketed.sparkSession
    grid = spark.createDataFrame([(p,) for p in probes], "n_probe int")
    swept = cand.join(
        F.broadcast(grid), F.col("probe_rank") <= F.col("n_probe")
    )
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    topk = (
        swept.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("n_probe", "query_id", "id")
    )
    truth = brute_force_topk(corpus, queries, k=k, vec_col=vec_col, id_col=id_col)
    # consumed by hits AND the query-count agg
    truth = _persist(truth.select("query_id", "neighbor_id"))
    hits = (
        topk.join(
            truth,
            (topk["query_id"] == truth["query_id"])
            & (topk["id"] == truth["neighbor_id"]),
            "left_semi",
        )
        .groupBy("n_probe")
        .agg(F.count("*").alias("n_hits"))
    )
    counts = swept.groupBy("n_probe").agg(F.count("*").alias("n_candidates"))
    qn = truth.agg(F.countDistinct("query_id").alias("n_q"))
    return (
        counts.join(hits, "n_probe", "left")
        .crossJoin(F.broadcast(qn))
        .select(
            F.col("n_probe").cast("long").alias("n_probe"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.round(F.col("n_candidates") / F.col("n_q"), 2).alias(
                "avg_candidates"
            ),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / (F.col("n_q") * k), 4
            ).alias("recall_at_k"),
        )
    )


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
    unit = spread_small(corpus).select(
        F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
    )
    bucketed = _nearest_centroids(unit, cents, "v")
    return bucketed, cents


def append_to_ivf_index(
    bucketed: DataFrame,
    centroids: np.ndarray,
    new_corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF index MAINTENANCE without a rebuild: assign only the incoming
    shard to the EXISTING centroids (one broadcast-matmul pass over the
    shard) and union with the standing bucket table. Because assignment
    is a pure per-row function of (vector, centroids), the appended
    index is EXACTLY the table a full rebuild with the same centroids
    would produce — pinned in pytest. At 100 TB this is the only viable
    ingest shape: appending a shard costs O(|shard|), and on a persisted
    layout (`save_ivf_index`) it is an appending write into the shard's
    bucket directories; periodic re-training of the centroids themselves
    is a separate, rarer event (it changes the layout version)."""
    unit = new_corpus.select(
        F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
    )
    assigned = _nearest_centroids(unit, centroids, "v")
    return bucketed.unionByName(assigned)


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


# ------------------------------------------------------------------- PQ

def train_pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_limit: int = 16384,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011): split the
    unit vector into `n_subspaces` contiguous sub-vectors and run Lloyd
    k-means with `n_codes` centroids independently in each subspace.

    Training is driver-side numpy over a bounded, DETERMINISTIC sample
    (first `sample_limit` ids) — the standard IVF/PQ recipe: codebooks
    come from a sample, the corpus at large only ever pays the single
    distributed encode pass. Returns (n_subspaces, n_codes, dsub).
    """
    sample = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample_limit)
        .collect()
    )
    # normalize driver-side: one numpy pass beats an interpreted JVM
    # higher-order-function chain for a bounded sample
    mat = np.array([r["v"] for r in sample], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n, dim = mat.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces
    rng = np.random.RandomState(seed)
    books = np.empty((n_subspaces, n_codes, dsub))
    for j in range(n_subspaces):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cents = sub[rng.choice(n, size=min(n_codes, n), replace=False)].copy()
        if len(cents) < n_codes:  # degenerate tiny corpus: pad with jitter
            pad = cents[rng.choice(len(cents), n_codes - len(cents))]
            cents = np.vstack([cents, pad + 1e-6 * rng.standard_normal(pad.shape)])
        for _ in range(iters):
            # ||x-c||² argmin ≡ (||c||² - 2x·c) argmin: one BLAS matmul
            # instead of an (n, ks, dsub) broadcast-subtract allocation
            d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (sub @ cents.T)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):  # empty clusters keep their centroid
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as `n_subspaces` uint8 codes (nearest centroid
    per subspace, L2): (id, codes array<int>). One Arrow pass; the encoded
    corpus is dim·8/n_subspaces-fold smaller than float64 vectors — the
    representation a 100 TB index actually stores and scans.

    ``extra_cols`` pass through the encode pass untouched (e.g. an IVF
    ``centroid`` assignment), so callers carrying per-row metadata avoid
    a corpus-sized id-join back onto the codes."""
    bc = corpus.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(codebooks)
    )
    unit = spread_small(corpus).select(
        F.col(id_col).alias("id"),
        normalize(as_double(vec_col)).alias("v"),
        *extra_cols,
    )
    id_type = unit.schema["id"].dataType.simpleString()
    extra_schema = "".join(
        f", {c} {unit.schema[c].dataType.simpleString()}" for c in extra_cols
    )

    def encode(batches):
        import pandas as pd

        books = bc.value
        m, ks, dsub = books.shape
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
                dots = sub @ books[j].T
                c2 = (books[j] ** 2).sum(axis=1)
                codes[:, j] = (c2[None, :] - 2 * dots).argmin(axis=1)
            out = {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return unit.mapInPandas(
        encode, f"id {id_type}, codes array<int>{extra_schema}"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    exclude_self: bool = True,
    codebooks: np.ndarray | None = None,
    rerank_k: int | None = None,
    codes: DataFrame | None = None,
    query_mat: "tuple[np.ndarray, np.ndarray] | None" = None,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over the PQ-encoded
    corpus: per query, precompute the (n_subspaces × n_codes) table of
    sub-vector dot products once on the driver; scanning a corpus row is
    then `n_subspaces` table gathers + a sum — no float vector math per
    pair. Approximate by construction (rows-only query; recall vs the
    exact scan is pinned in pytest).

    Scale shape: queries ≪ corpus, so the LUT stack (Q·m·ks doubles)
    broadcasts; the corpus side scans int codes (4 GB/billion vectors at
    m=8 vs 512 GB of float64), and only (query_id, id, score) rows reach
    the per-query top-k — the same tail as brute_force_topk with a ~64x
    cheaper scan.

    `rerank_k`: the standard two-stage shape — ADC shortlists the top
    `rerank_k` per query, then ONLY those Q·rerank_k rows pay an exact
    float re-score (one semi-join back to the vectors). Near-exact recall
    for a scan that never touches floats outside the shortlist.

    `codes`: pass the PRE-ENCODED (id, codes) table to skip the encode
    pass — the code table IS the PQ index, built once per corpus version
    (the registered demo serves it from the memo store, like the IVF
    layout); `codebooks` must be the ones that produced it.

    `query_mat`: (ids, unit-normalized row matrix) for the queries,
    driver-resident — the shape a serving path actually has (queries
    arrive from the application as vectors, not as a table to re-scan
    and re-normalize per call). Supersedes `queries` for the LUT build;
    `queries` may then be None."""
    from .dedup import _persist

    # normalize ONCE into a managed-persisted (id, v) frame: the codebook
    # sample, the encode pass, and the shortlist re-rank all read it —
    # without this the raw corpus is scanned (and re-normalized) up to
    # three times per call. When BOTH the codebooks and the code table
    # are supplied (the served-index path the registered demo runs), the
    # only remaining consumer is the one shortlist re-rank join — a
    # single codegen scan — so pinning N·dim doubles in cache would cost
    # a materialization pass per call for nothing (r10: ~0.3 s of a
    # 1.6 s op at sf0.1).
    unit = corpus.select(
        F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
    )
    if codebooks is None or codes is None:
        unit = _persist(unit)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            unit, n_subspaces, n_codes, iters, "v", "id", seed
        )
    if codes is None:
        codes = pq_encode(unit, codebooks, "v", "id")
    if query_mat is not None:
        qids = np.asarray(query_mat[0])
        qmat = np.asarray(query_mat[1], dtype=np.float64)
    else:
        qrows = (
            queries.select(
                F.col(id_col).alias("qid"),
                normalize(as_double(vec_col)).alias("qv"),
            )
            .orderBy("qid")
            .collect()
        )
        qids = np.array([r["qid"] for r in qrows])
        qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    m, ks, dsub = codebooks.shape
    # LUT[q, j, c] = q_sub[j] · codebook[j][c]  (inner-product ADC)
    lut = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids), m, dsub), codebooks)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, lut))
    id_type = codes.schema["id"].dataType.simpleString()

    def scan(batches):
        import pandas as pd

        q_ids, tables = bc.value
        cols = np.arange(tables.shape[1])
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.stack(pdf["codes"].to_numpy())  # (B, m)
            ids = pdf["id"].to_numpy()
            for qi, qid in enumerate(q_ids):
                scores = tables[qi][cols[None, :], cm].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(ids), qid),
                        "id": ids,
                        "score": scores,
                    }
                )

    scored = codes.mapInPandas(
        scan, f"query_id {id_type}, id {id_type}, score double"
    )
    if exclude_self:
        scored = scored.filter(F.col("id") != F.col("query_id"))
    if not rerank_k:
        return _rank_topk(scored, k)
    shortlist = _rank_topk(scored, max(rerank_k, k)).select(
        "query_id", F.col("neighbor_id").alias("id")
    )
    if queries is not None:
        qdf = queries.select(
            F.col(id_col).alias("query_id"),
            normalize(as_double(vec_col)).alias("qv"),
        )
    else:  # driver-resident queries: Q rows, no scan, no job
        # query_id typed from the code table like the ADC scan schema —
        # a string-id corpus must not hit a hardcoded bigint/int() path
        py = (
            (lambda x: str(x))
            if id_type == "string"
            else (lambda x: int(x))
        )
        qdf = corpus.sparkSession.createDataFrame(
            [(py(i), [float(x) for x in v]) for i, v in zip(qids, qmat)],
            f"query_id {id_type}, qv array<double>",
        )
    rescored = (
        # `unit` is cache-served on the build paths; on the served-index
        # path (codebooks+codes supplied) it is deliberately unpersisted,
        # so this join IS the path's single corpus scan (see the pinning
        # note above)
        shortlist.join(unit, "id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "id", dot(F.col("v"), F.col("qv")).alias("score"))
    )
    return _rank_topk(rescored, k)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 16,
    n_codes: int = 64,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    exclude_self: bool = True,
    rerank_k: int | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ architecture, DataFrame-native): a coarse
    quantizer prunes the corpus to ``n_probe`` of ``n_centroids`` buckets
    per query, and within the probed buckets scoring is PQ/ADC table
    gathers over the int codes — the float vectors are touched only by
    the optional exact re-rank of the final shortlist.

    Cost at scale multiplies the two savings: ~n_probe/n_centroids of the
    corpus scanned × ~40× fewer bytes per scanned row (12-16 code bytes
    vs 8·dim float64). The probe join key is the centroid id (small int,
    broadcast probes), the ADC emits only (query_id, id, score) rows, and
    the re-rank semi-joins Q·rerank_k vectors. Recall vs the exact scan
    is pinned in pytest."""
    from .dedup import _persist

    # normalize ONCE into a managed-persisted (id, v) frame shared by the
    # coarse quantizer, the codebook sample, the encode pass, and the
    # re-rank; encoding the BUCKETED frame with the centroid passed
    # through also removes the corpus-sized id-join codes⋈buckets that
    # this path originally paid
    unit = _persist(
        corpus.select(
            F.col(id_col).alias("id"), normalize(as_double(vec_col)).alias("v")
        )
    )
    bucketed, cents = build_ivf_index(unit, n_centroids, "v", "id", seed)
    books = (
        codebooks
        if codebooks is not None
        else train_pq_codebooks(
            unit, n_subspaces, n_codes, iters, "v", "id", seed
        )
    )
    enc = pq_encode(bucketed, books, "v", "id", extra_cols=("centroid",))

    qrows = (
        queries.select(
            F.col(id_col).alias("qid"), normalize(as_double(vec_col)).alias("qv")
        )
        .orderBy("qid")
        .collect()
    )
    qids = np.array([r["qid"] for r in qrows])
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    m, ks, dsub = books.shape
    lut = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qids), m, dsub), books)
    q_unit = queries.select(
        F.col(id_col).alias("query_id"), normalize(as_double(vec_col)).alias("qv")
    )
    probes = _nearest_centroids(q_unit, cents, "qv", n_top=n_probe).select(
        "query_id", "centroid"
    )
    cand = enc.join(F.broadcast(probes), "centroid")
    bc = corpus.sparkSession.sparkContext.broadcast((qids, lut))
    id_type = enc.schema["id"].dataType.simpleString()

    def scan(batches):
        import pandas as pd

        q_ids, tables = bc.value
        # Key on the raw id value (mirrors pq_topk): query ids may be
        # strings or any type, not just ints.
        pos = {q: i for i, q in enumerate(q_ids)}
        cols = np.arange(tables.shape[1])
        for pdf in batches:
            if pdf.empty:
                continue
            cm = np.stack(pdf["codes"].to_numpy())
            qi = np.array([pos[q] for q in pdf["query_id"]])
            scores = tables[qi[:, None], cols[None, :], cm].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "id": pdf["id"].to_numpy(),
                    "score": scores,
                }
            )

    scored = cand.mapInPandas(
        scan, f"query_id {id_type}, id {id_type}, score double"
    )
    if exclude_self:
        scored = scored.filter(F.col("id") != F.col("query_id"))
    if not rerank_k:
        return _rank_topk(scored, k)
    shortlist = _rank_topk(scored, max(rerank_k, k)).select(
        "query_id", F.col("neighbor_id").alias("id")
    )
    rescored = (
        shortlist.join(unit, "id")  # cached unit frame, not a re-scan
        .join(F.broadcast(q_unit), "query_id")
        .select("query_id", "id", dot(F.col("v"), F.col("qv")).alias("score"))
    )
    return _rank_topk(rescored, k)


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    topk: DataFrame | None = None,
) -> DataFrame:
    """k-NN majority-vote classification over the embedding column — the
    label-audit / auto-label workflow: each query vector takes the most
    frequent label among its k exact-cosine nearest LABELED neighbors
    (ties → smallest label, so the vote is deterministic and
    SQL-oracle-able).

    Composition: `brute_force_topk` (broadcast queries, one corpus scan)
    → broadcast-size join back to neighbor labels → query-KEYED argmax
    window. Returns (query_id, pred_label, votes). The scale path swaps
    the exact top-k for `ivf_topk`/`pq_topk` without touching the vote —
    pass the precomputed (query_id, neighbor_id, rank, score) frame as
    ``topk`` (the `knn_label_vote_ivf` demo does exactly this over the
    persisted IVF layout)."""
    top = (
        topk
        if topk is not None
        else brute_force_topk(
            corpus, queries, k=k, vec_col=vec_col, id_col=id_col
        )
    )
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_lbl")
    )
    votes = (
        top.join(labels, "neighbor_id")
        .groupBy("query_id", "_lbl")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_lbl").asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.col("_lbl").cast("long").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
        )
    )


def save_ivf_index(
    bucketed: DataFrame, centroids: np.ndarray, path: str
) -> None:
    """Persist an IVF index: the bucketed corpus hive-partitioned by
    centroid id (each probe then reads ONLY its bucket directories —
    partition pruning is the point of IVF on disk) plus the centroid
    matrix as a C-row parquet. This is what "the index" IS at 100 TB:
    a layout, not an in-memory structure."""
    bucketed.write.mode("overwrite").partitionBy("centroid").parquet(
        f"{path}/buckets"
    )
    spark = bucketed.sparkSession
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "centroid int, vec array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """Read a `save_ivf_index` layout back. The partition column comes
    back as string (type inference is deliberately off in the session);
    cast restores the int join key."""
    bucketed = spark.read.parquet(f"{path}/buckets").withColumn(
        "centroid", F.col("centroid").cast("int")
    )
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()  # C rows
    cents = np.array(
        [r["vec"] for r in sorted(cent_rows, key=lambda r: r["centroid"])]
    )
    return bucketed, cents


def ivf_topk_pruned(
    bucketed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """`ivf_topk` with an EXPLICIT partition-prune: the probed centroid
    ids (n_probe × |queries| values — bounded because the query set is;
    the broadcast-join path serves unbounded query streams) are pushed as
    an `isin` filter on the partition column, so a disk-backed index scan
    touches only the probed bucket directories. The plan's
    PartitionFilters line is pinned in tests/test_pipeline.py."""
    q = queries.select(
        F.col(id_col).alias("query_id"), normalize(as_double(vec_col)).alias("qv")
    )
    probes = _nearest_centroids(q, centroids, "qv", n_top=n_probe)
    probe_ids = sorted(
        {r["centroid"] for r in probes.select("centroid").distinct().collect()}
    )
    pruned = bucketed.filter(F.col("centroid").isin(probe_ids))
    joined = pruned.join(F.broadcast(probes), on="centroid")
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "id", dot(F.col("v"), F.col("qv")).alias("score")
    )
    return _rank_topk(scored, k)


def mmr_select(
    embeddings: DataFrame,
    query_id: int = 0,
    pool_lo: int = 1,
    pool_hi: int = 127,
    k: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """EAGER: collects the (pool-bounded) candidate vectors and runs
    the greedy loop at CALL time, returning a snapshot local frame —
    persist an expensive ``embeddings`` input before calling (ADVICE
    r13). Greedy Maximal Marginal Relevance selection (Carbonell &
    Goldstein 1998): pick ``k`` items maximizing
    ``0.7·cos(v, q) − 0.3·max_{s∈S} cos(v, s)`` — relevance to the query
    minus redundancy with what's already chosen. THE diversity-selection
    primitive for eval-set construction and prompt-example curation,
    where plain top-k returns k near-copies of the same best document.

    Control flow is honestly sequential (each pick depends on the last),
    and the candidate POOL is bounded by contract (pool_lo..pool_hi — at
    100 TB you run this over a pre-filtered top-N-by-relevance pool, the
    standard two-stage shape). So the greedy loop runs on the DRIVER
    over ONE bounded collect of the pool + query vectors (optimization
    r13, guide §1.2: the former formulation ran k distributed
    argmax passes + two persists — 8+ jobs for k=6 picks over a ≤127-row
    pool). The arithmetic is the identical IEEE double sequence the
    in-plan expressions ran (functions/vectors.py documents the
    left-fold accumulation order; Python floats are the same doubles),
    so the trajectory — ties broken by id ascending — is unchanged and
    the k-step unrolled-CTE DuckDB oracle still replays it exactly."""
    import math

    from ..plans.guards import collect_bounded

    rows = collect_bounded(
        embeddings.filter(
            ((F.col(id_col) >= pool_lo) & (F.col(id_col) <= pool_hi))
            | (F.col(id_col) == query_id)
        ).select(F.col(id_col).alias("id"), as_double(vec_col).alias("v")),
        cap=_MMR_COLLECT_CAP,  # pool-bounded by contract (≤ pool_hi - pool_lo + 2)
        what="mmr_select",
    )

    def _div(x: float, n: float) -> float:
        # Spark double division semantics: x/0 -> ±Inf, 0/0 -> NaN
        if n == 0.0:
            return float("nan") if x == 0.0 else math.copysign(
                float("inf"), x
            )
        return x / n

    def _unit(v: list) -> list:
        acc = 0.0
        for x in v:
            acc = acc + x * x  # left fold, same order as F.aggregate
        n = math.sqrt(acc)
        return [_div(x, n) for x in v]

    def _dot(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    qv = None
    pool_vecs: dict[int, list] = {}
    for r in rows:
        if r["id"] == query_id:
            qv = _unit(list(r["v"]))
        if pool_lo <= r["id"] <= pool_hi:
            pool_vecs[r["id"]] = _unit(list(r["v"]))

    spark = embeddings.sparkSession
    picked: list[tuple[int, int, float]] = []
    if qv is not None:
        rel = {i: _dot(v, qv) for i, v in pool_vecs.items()}
        chosen: list[int] = []
        for step in range(1, k + 1):
            best_id, best_score = None, None
            for i in sorted(pool_vecs):
                if i in chosen:
                    continue
                if not chosen:
                    score = 0.7 * rel[i]
                else:
                    ms = max(
                        _dot(pool_vecs[i], pool_vecs[s]) for s in chosen
                    )
                    score = 0.7 * rel[i] - 0.3 * ms
                # argmax with (score desc, id asc); NaN sorts largest,
                # matching Spark's double ordering
                if best_id is None or (
                    math.isnan(score) and not math.isnan(best_score)
                ) or (
                    not math.isnan(best_score) and score > best_score
                ):
                    best_id, best_score = i, score
            if best_id is None:  # pool exhausted: k > |pool| degrades
                break
            chosen.append(best_id)
            picked.append((step, best_id, float(best_score)))
    out = spark.createDataFrame(
        picked, "sel_rank long, vec_id long, score double"
    )
    return out.select("sel_rank", "vec_id", F.round("score", 4).alias("score"))


def hbos_outlier_scores(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bins: int = 8,
) -> DataFrame:
    """HBOS — Histogram-Based Outlier Score (Goldstein & Dengel 2012):
    per-dimension equi-width histograms, score(x) = Σ_d −log density of
    x's bin in dimension d. The unsupervised anomaly detector that needs
    NO pairwise distances — two corpus passes (min/max, then bin counts)
    and a broadcast histogram, so it runs where kNN-based outlier
    methods (`label_outlier_report`'s pairwise scan) can't.

    Exactness: bin ids come from one fixed IEEE expression
    (floor((x−min)/(max−min)·B), capped), counts are integers, and the
    score is Σ round(1000·ln(N/cnt)) integer milli-nats — the DuckDB
    oracle reproduces every step bit-for-bit. Returns (id, score_milli).
    """
    el = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(as_double(vec_col)).alias("dim", "x"),
    )
    rng = el.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    n_tot = embeddings.agg(F.count("*").alias("_n"))
    binned = el.join(F.broadcast(rng), "dim").select(
        "id",
        "dim",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("x") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * n_bins
                ).cast("int"),
                F.lit(n_bins - 1),
            )
        )
        .alias("bin"),
    )
    hist = binned.groupBy("dim", "bin").agg(F.count("*").alias("cnt"))
    return (
        binned.join(F.broadcast(hist), ["dim", "bin"])
        .crossJoin(F.broadcast(n_tot))
        .select(
            "id",
            F.round(
                F.log(F.col("_n").cast("double") / F.col("cnt")) * 1e3
            )
            .cast("long")
            .alias("term"),
        )
        .groupBy("id")
        .agg(F.sum("term").cast("long").alias("score_milli"))
    )
