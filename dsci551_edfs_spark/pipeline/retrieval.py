"""Ranked full-text retrieval over the corpus: BM25 scoring + top-k.

The missing sibling of the TF-IDF family in `functions.text` /
`pipeline.dedup`: given a bag of query terms, score every document with
BM25 (Robertson/Spärck Jones; the Lucene "BM25+1" idf variant that never
goes negative) and return the best k. This is the retrieval primitive a
training-data pipeline uses for targeted corpus mining ("find me docs
about X to upsample") and for building retrieval-augmented eval sets.

Scale posture:
- One explode over the corpus with the query-term filter applied BEFORE
  the (doc, term) aggregation, so the shuffle carries only matching
  tokens — for a q-term query that's a tiny fraction of the corpus.
- Per-term df and the corpus scalars (N, total token count) are
  query-term-sized / scalar: broadcast joins, no second corpus shuffle.
- Top-k is a global orderBy().limit(k): Spark runs TakeOrderedAndProject
  (per-partition heaps + driver merge of k·P rows), no full sort.

Numeric contract (FP-order-free, house micro-nat style): with k1 = 6/5
and b = 3/4 the per-term score

    idf · tf(k1+1) / (tf + k1(1 - b + b·dl/avgdl))

rewrites over avgdl = SL/N (SL = Σ doc lengths) to the integer-heavy form

    idf_micro · 22·SL·tf / (10·SL·tf + 3·SL + 9·dl·N)

so the only floating-point steps are the idf ln() (frozen to integer
micro-nats, same as `tfidf_keywords`) and ONE bigint/bigint division —
both IEEE-identical between Spark and DuckDB, which is what lets the
oracle hash-match the summed score exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "bm25_topk",
    "hybrid_rrf_topk",
    "bm25_eval_metrics",
    "hashed_tfidf_vectors",
    "hashed_tfidf_knn",
    "BM25_K1_NUM",
    "BM25_B_NUM",
]

# k1 = 6/5, b = 3/4 as exact rationals — the standard defaults, chosen
# here as small fractions so the score rewrites to integer arithmetic.
BM25_K1_NUM = (6, 5)
BM25_B_NUM = (3, 4)


def _bm25_tf_corpus(
    df: DataFrame,
    terms: list[str],
    text_col: str,
    id_col: str,
    tf_table: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The BM25 family's shared prelude: the per-(doc, query-term)
    ``tf`` frame (columns doc_id, term, tf, dl) and the one-row corpus
    scalars (n_docs, sl). Two spellings, value-identical:

    - inline (default): one tokenize+explode scan with the term filter
      before the shuffle, plus a second tokenize scan for the corpus
      scalars — the original shape.
    - ``tf_table`` + ``doc_stats`` (optimization r14): the (id, token,
      tf) per-corpus layout (`shared_text_layout.token_tf` — same
      `tokens()` tokenization, so counts are identical) and its (id, dl)
      statistics sibling (`token_doc_stats`, dl = Σ tf). tf rows are a
      term filter of the layout (no explode, no count agg), dl attaches
      by an id join against the doc-cardinality stats frame, sl = Σ dl
      over the stats frame, and n_docs stays a count of ``df``
      (zero-token docs have no layout rows but do count toward N).
      BOTH tokenize scans disappear from the per-query cost and no
      token-level aggregate runs at query time.
    """
    if tf_table is not None:
        t = tf_table
        if "id" in t.columns and "doc_id" not in t.columns:
            t = t.withColumnRenamed("id", "doc_id")
        base = t.select(
            "doc_id",
            F.col("token").alias("term"),
            F.col("tf").cast("long").alias("tf"),
        )
        if doc_stats is None:
            dl = base.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        else:
            dl = doc_stats
            if "id" in dl.columns and "doc_id" not in dl.columns:
                dl = dl.withColumnRenamed("id", "doc_id")
            dl = dl.select("doc_id", F.col("dl").cast("long").alias("dl"))
        corpus = (
            df.agg(F.count("*").alias("n_docs"))
            .crossJoin(dl.agg(F.sum("dl").alias("sl")))
        )
        tf = (
            base.filter(F.col("term").isin(terms))
            .join(dl, "doc_id")
            .select("doc_id", "term", "tf", "dl")
        )
        return tf, corpus
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    # corpus scalars: N docs, SL total tokens — one scalar-agg broadcast
    corpus = df.select(
        F.size(tokens(F.col(text_col))).cast("long").alias("_dl")
    ).agg(F.count("*").alias("n_docs"), F.sum("_dl").alias("sl"))
    # matching tokens only — the filter lands before the shuffle
    hits = toks.filter(F.col("term").isin(terms))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    return tf, corpus


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    tf_table: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by BM25 against a fixed bag of query terms.

    Returns ``(doc_id, score_micro)`` with ``score_micro`` the summed
    per-term BM25 contribution in integer micro-units (bigint), ordered
    score-desc then id-asc (deterministic tiebreak).

    Query terms are lowercased and deduplicated; BM25 term frequency is
    over the same whitespace tokenization as the rest of the text stack.
    ``tf_table`` injects the per-corpus (id, token, tf) layout — see
    `_bm25_tf_corpus`.
    """
    terms = sorted({t.lower() for t in query_terms})
    tf, corpus = _bm25_tf_corpus(
        df, terms, text_col, id_col, tf_table, doc_stats
    )
    # df per query term: query-term-sized frame, broadcast
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    scored = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(corpus))
    idf_micro = F.round(
        F.log(
            (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
            + F.lit(1.0)
        )
        * 1e6
    ).cast("long")
    num = idf_micro * 22 * F.col("sl") * F.col("tf")
    den = 10 * F.col("sl") * F.col("tf") + 3 * F.col("sl") + 9 * F.col("dl") * F.col(
        "n_docs"
    )
    per_term = F.round(num.cast("double") / den.cast("double")).cast("long")
    return (
        scored.select("doc_id", per_term.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(k)
    )


def _join_rank(
    leg: DataFrame, score_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, rnk) over a LEG-SIZED frame (≤ n_leg rows by construction)
    without a global window: rnk = 1 + |strictly better rows|, better =
    (score desc, id asc). A self-join on ≤50 rows is constant work at any
    corpus size — the registry lint (test_plans) forbids the
    empty-partition-spec WindowExec this replaces."""
    a, b = leg.alias("a"), leg.alias("b")
    sa, sb = F.col(f"a.{score_col}"), F.col(f"b.{score_col}")
    ia, ib = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    better = (sb > sa) | ((sb == sa) & (ib < ia))
    return (
        a.join(b, better, "left")
        .groupBy(ia.alias(id_col))
        .agg((F.count(ib) + F.lit(1)).cast("long").alias("rnk"))
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    k: int = 20,
    n_leg: int = 50,
    rrf_k: int = 60,
    tf_table: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with Reciprocal Rank Fusion
    (Cormack/Clarke/Büttcher 2009): each leg contributes
    ``round(1e6 / (rrf_k + rank))`` integer micro-points for its top
    ``n_leg`` hits, summed per doc; return the top ``k`` by fused score
    (id-asc tiebreak). The modern RAG-corpus retrieval shape: BM25 catches
    exact-term docs the embedding misses, the vector leg catches
    paraphrases.

    Legs: `bm25_topk` over ``query_terms``; exact cosine top-n against the
    stored embedding of ``query_vec_id`` (brute force — the small-corpus
    baseline; swap the IVF/PQ path from `pipeline.similarity` for the
    100 TB corpus, fusion is identical). Both legs end n_leg-BOUNDED, so
    ranking and fusion are constant-size work regardless of corpus scale;
    only the two leg scans are corpus-sized. Integer contributions keep
    the whole fusion FP-free → DuckDB-hash-matchable."""
    from .similarity import brute_force_topk

    lex = _join_rank(
        bm25_topk(
            docs, query_terms, text_col=text_col, id_col=id_col, k=n_leg,
            tf_table=tf_table, doc_stats=doc_stats,
        ),
        "score_micro",
        id_col,
    )
    qv = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    vec = brute_force_topk(
        embeddings, qv, k=n_leg, vec_col=vec_col, id_col=vec_id_col
    ).select(F.col("neighbor_id").alias(id_col), F.col("rank").cast("long").alias("rnk"))
    contrib = lambda d: d.select(  # noqa: E731
        id_col,
        F.round(F.lit(1e6) / (F.lit(rrf_k) + F.col("rnk"))).cast("long").alias("c"),
    )
    return (
        contrib(lex)
        .unionByName(contrib(vec))
        .groupBy(id_col)
        .agg(F.sum("c").alias("rrf_micro"))
        .orderBy(F.col("rrf_micro").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_eval_metrics(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    min_tf: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf_table: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """IR evaluation harness: treat each term as a one-term query, rank
    the corpus by its BM25 contribution, and score the ranking against a
    deterministic relevance set (docs with tf ≥ ``min_tf``) with the
    classic retrieval metrics.

    Returns one row per term:
    ``(term, n_rel, hits, prec_micro, recall_micro, rr_micro, ap_micro)``
    — precision@k, recall@k, reciprocal rank, and average precision, all
    in integer micro-units so the only FP steps are single well-defined
    divisions (round(1e6·a/b)) that are IEEE-identical on any engine →
    DuckDB-hash-matchable. This is the eval loop a corpus-mining pipeline
    runs to pick retrieval settings before committing to an upsample.

    Scale posture: the corpus-sized work is the SAME single filtered
    explode as `bm25_topk` (only matching tokens shuffle). Ranking is a
    window partitioned BY TERM (q partitions, never the unpartitioned
    global window the registry lint forbids) over the per-term match
    lists; everything after the ≤ q·k row QUALIFY is constant-size.
    ``tf_table`` injects the per-corpus (id, token, tf) layout — see
    `_bm25_tf_corpus`.
    """
    from pyspark.sql import Window

    terms = sorted({t.lower() for t in terms})
    tf, corpus = _bm25_tf_corpus(
        df, list(terms), text_col, id_col, tf_table, doc_stats
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    scored = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(corpus))
    idf_micro = F.round(
        F.log(
            (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
            + F.lit(1.0)
        )
        * 1e6
    ).cast("long")
    num = idf_micro * 22 * F.col("sl") * F.col("tf")
    den = 10 * F.col("sl") * F.col("tf") + 3 * F.col("sl") + 9 * F.col(
        "dl"
    ) * F.col("n_docs")
    per_term = scored.select(
        "term",
        "doc_id",
        "tf",
        F.round(num.cast("double") / den.cast("double")).cast("long").alias("c"),
    )
    w = Window.partitionBy("term").orderBy(F.col("c").desc(), F.col("doc_id"))
    ranked = (
        per_term.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("term", "doc_id", "rnk")
    )
    qrels = per_term.filter(F.col("tf") >= min_tf).select(
        "term", "doc_id", F.lit(1).cast("long").alias("rel")
    )
    n_rel = qrels.groupBy("term").agg(F.count("*").alias("n_rel"))
    flagged = ranked.join(qrels, ["term", "doc_id"], "left").select(
        "term", "doc_id", "rnk", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    wc = (
        Window.partitionBy("term")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = flagged.withColumn("cum_rel", F.sum("rel").over(wc))
    per_q = cum.groupBy("term").agg(
        F.sum("rel").alias("hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.round(
                    F.lit(1e6) * F.col("cum_rel") / F.col("rnk")
                ).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("sum_prec_micro"),
    )
    return (
        per_q.join(F.broadcast(n_rel), "term")
        .select(
            "term",
            "n_rel",
            "hits",
            F.round(F.lit(1e6) * F.col("hits") / F.lit(k))
            .cast("long")
            .alias("prec_micro"),
            F.round(F.lit(1e6) * F.col("hits") / F.col("n_rel"))
            .cast("long")
            .alias("recall_micro"),
            F.coalesce(
                F.round(F.lit(1e6) / F.col("first_rel")).cast("long"), F.lit(0)
            ).alias("rr_micro"),
            F.round(F.col("sum_prec_micro").cast("double") / F.col("n_rel"))
            .cast("long")
            .alias("ap_micro"),
        )
        .orderBy("term")
    )


def bm25_ndcg(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    min_tf: int = 2,
    gain_cap: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf_table: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """nDCG@k for the same one-term-query BM25 harness as
    `bm25_eval_metrics` — the GRADED-relevance metric the binary
    P/R/RR/AP quartet can't express (a rank-1 hit on a tf-5 doc should
    beat a rank-1 hit on a tf-2 doc). Gain = min(tf, ``gain_cap``) for
    docs at or above the ``min_tf`` relevance gate, 0 below it; DCG
    terms are frozen integers round(1e6·gain / log2(rank+1)), IDCG
    replays the ideal ordering (gain desc, doc_id) over the relevance
    set capped at k, and nDCG is ONE final round(1e6·dcg/idcg)
    division — the house single-division discipline, so a DuckDB
    restatement hash-matches.

    Scale posture: identical to `bm25_eval_metrics` — one filtered
    explode (only query terms shuffle), per-TERM windows (q partitions,
    lint-clean), everything after the ≤ q·k QUALIFY constant-size.
    ``tf_table`` injects the per-corpus (id, token, tf) layout — see
    `_bm25_tf_corpus`. Returns
    ``(term, dcg_micro, idcg_micro, ndcg_micro)``."""
    from pyspark.sql import Window

    terms = sorted({t.lower() for t in terms})
    tf, corpus = _bm25_tf_corpus(
        df, list(terms), text_col, id_col, tf_table, doc_stats
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    scored = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(corpus))
    idf_micro = F.round(
        F.log(
            (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
            / (F.col("df_t") + F.lit(0.5))
            + F.lit(1.0)
        )
        * 1e6
    ).cast("long")
    num = idf_micro * 22 * F.col("sl") * F.col("tf")
    den = 10 * F.col("sl") * F.col("tf") + 3 * F.col("sl") + 9 * F.col(
        "dl"
    ) * F.col("n_docs")
    per_term = scored.select(
        "term",
        "doc_id",
        "tf",
        F.round(num.cast("double") / den.cast("double"))
        .cast("long")
        .alias("c"),
        F.when(F.col("tf") >= min_tf, F.least(F.col("tf"), F.lit(gain_cap)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("gain"),
    )
    w = Window.partitionBy("term").orderBy(F.col("c").desc(), F.col("doc_id"))
    disc = lambda rnk: F.round(  # noqa: E731 — the ONE frozen DCG term
        F.lit(1e6) * F.col("gain") / F.log2(rnk + F.lit(1.0))
    ).cast("long")
    dcg = (
        per_term.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .groupBy("term")
        .agg(F.sum(disc(F.col("rnk"))).cast("long").alias("dcg_micro"))
    )
    wi = Window.partitionBy("term").orderBy(
        F.col("gain").desc(), F.col("doc_id")
    )
    idcg = (
        per_term.filter(F.col("gain") > 0)
        .withColumn("rnk", F.row_number().over(wi).cast("long"))
        .filter(F.col("rnk") <= k)
        .groupBy("term")
        .agg(F.sum(disc(F.col("rnk"))).cast("long").alias("idcg_micro"))
    )
    return (
        dcg.join(idcg, "term")
        .select(
            "term",
            "dcg_micro",
            "idcg_micro",
            F.round(
                F.lit(1e6)
                * F.col("dcg_micro").cast("double")
                / F.col("idcg_micro")
            )
            .cast("long")
            .alias("ndcg_micro"),
        )
        .orderBy("term")
    )


def hashed_tfidf_vectors(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    tf: DataFrame | None = None,
) -> DataFrame:
    """The feature-hashing trick (Weinberger et al. 2009): TF-IDF doc
    vectors of FIXED dimension ``dim`` with no vocabulary table — each
    token maps straight to bucket ``md5_32(token) mod dim`` and its
    integer milli-nat weight (tf · round(1000·ln(N/df))) sums into that
    component. Returned sparse as ``(id, bucket, w)`` exact-integer rows.

    Why it matters at 100 TB: the vocab-keyed TF-IDF path
    (`dedup.tfidf_cosine_pairs`) shuffles a token-cardinality frame and
    needs the DF table joined back; hashing removes the vocabulary as a
    distributed object entirely — the per-doc projection is stateless
    apart from the (token → df) broadcast, and downstream consumers get
    dense fixed-width vectors they can feed to the exact same ANN
    machinery as learned embeddings (IVF/PQ/binary-sign). Collisions
    just add weights — the standard, well-understood hashing-trick bias.
    """
    from ..pipeline.dedup import _md5_base_hash

    # `tf` injects the per-corpus (id, token, tf) layout
    # (shared_text_layout.token_tf, bucketed by token — optimization
    # r14): the tokenize scan and the (id, token) exchange disappear,
    # and the DF aggregate below reads the bucketed scan exchange-free.
    # Identical counts either way.
    if tf is None:
        toks = docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    dfr = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_tot = docs.agg(F.count("*").alias("_n"))
    w = (
        tf.join(F.broadcast(dfr), "token")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "id",
            (_md5_base_hash(F.col("token")) % dim).alias("bucket"),
            (
                F.col("tf").cast("long")
                * F.round(
                    F.log(F.col("_n").cast("double") / F.col("df")) * 1e3
                ).cast("long")
            ).alias("w"),
        )
    )
    return w.groupBy("id", "bucket").agg(F.sum("w").alias("w"))


def hashed_tfidf_knn(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    query_mod: int = 50,
    k: int = 5,
    query_id_max: int = 5000,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Lexical k-NN over hashed TF-IDF vectors: every ``query_mod``-th
    doc AMONG THE FIRST ``query_id_max`` ids plays the query set,
    scored against the rest by cosine over the ``dim`` hashed
    components. The id ceiling makes the query set FIXED-SIZE as the
    corpus grows — without it Q scales with N and the bucket-sparse
    scoring join goes quadratic (the round-11 real-5× suite measured
    5.7× at 5× data; a production kNN serves a fixed query workload
    against a growing corpus, which is the shape this pins). Dot
    products and squared norms are exact integers; the only FP is the
    final dot/(√n2q·√n2c) — a fixed three-op IEEE expression both
    engines evaluate identically, so the ranking (score desc, id asc)
    is oracle-stable.

    Scale: the vector build is one corpus scan (see
    `hashed_tfidf_vectors`); the scoring join is sparse-by-bucket with
    the query side broadcast (Q·dim rows), so the corpus never shuffles
    for the match — the same broadcast-queries shape as
    `similarity.brute_force_topk`, but reached from raw text with no
    model and no vocabulary."""
    from pyspark.sql import Window

    from .dedup import _persist

    # registered with release_cached like every pinned intermediate
    vecs = _persist(hashed_tfidf_vectors(docs, text_col, id_col, dim, tf=tf))
    is_q = ((F.col("id") % query_mod) == 0) & (
        F.col("id") < query_id_max
    )
    qv = vecs.filter(is_q)
    cv = vecs.filter(~is_q)
    n2 = vecs.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    dot = (
        cv.join(
            F.broadcast(
                qv.select(
                    F.col("id").alias("qid"),
                    F.col("bucket"),
                    F.col("w").alias("wq"),
                )
            ),
            "bucket",
        )
        .groupBy("qid", F.col("id").alias("cid"))
        .agg(F.sum(F.col("w") * F.col("wq")).alias("dot"))
    )
    scored = (
        dot.join(
            F.broadcast(n2.select(F.col("id").alias("qid"), F.col("n2").alias("n2q"))),
            "qid",
        )
        .join(n2.select(F.col("id").alias("cid"), F.col("n2").alias("n2c")), "cid")
        .withColumn(
            "score",
            F.col("dot")
            / (F.sqrt(F.col("n2q").cast("double")) * F.sqrt(F.col("n2c").cast("double"))),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("cid").cast("long").alias("neighbor_id"),
            F.col("rnk").cast("long").alias("rnk"),
            F.round("score", 4).alias("score"),
        )
    )
