"""Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer round: piece
inventory from substring statistics, Viterbi segmentation of the corpus
under milli-nat piece costs, and the resulting piece-usage counts (the
E-step sufficient statistics an EM iteration feeds the M-step).

This is the OTHER major subword-tokenizer family next to BPE
(functions/text.py): BPE grows a vocabulary bottom-up by merges; unigram
LM starts from a large candidate inventory and scores segmentations
top-down with a probabilistic model. A training-data pipeline uses this
round for vocabulary induction, tokenizer fertility studies and
compression-rate scoring.

Scale design — the reason this fits 100 TB:
- The corpus is touched ONCE: tokenize + groupBy(word) → the
  frequency-weighted DISTINCT-word vocabulary. Everything after —
  candidate pieces, costs, DP, backtrace — is VOCAB-sized (the
  SentencePiece trick: segment types, weight by token frequency).
- The Viterbi DP is RELATIONAL, not expression-nested: level j of the
  lattice is one vocab-sized join (spans ending at j × best prefixes) +
  a map-side-combinable min(struct) argmin. 12 levels = 12 small joins;
  no exponential expression tree for Catalyst to choke on, each level's
  frame is reusable by the next four.
- Backtrace is the same shape run backwards: ≤12 join steps emitting
  one piece each, unioned, then ONE groupBy(piece).

Exactness: piece costs are integer MILLI-NATS (round(1000·ln(total/cnt)),
the house freeze), and the DP minimizes cost·16 + (4 − piece_len) — the
tie-break is IN the integer objective (prefer longer pieces), and
residual ties fall to the min-struct's second field (smallest start
position). Every argmax the trajectory takes is therefore
engine-independent, which is what lets a DuckDB oracle with
MATERIALIZED per-level CTEs replay the entire lattice bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["unigram_lm_piece_counts", "unigram_lm_fertility", "unigram_lm_oracle_sql"]

MAX_PIECE = 4
MAX_WORD = 12
MIN_COUNT = 2


def unigram_lm_piece_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
    _emissions_only: bool = False,
) -> DataFrame:
    """One unigram-LM round over the corpus: returns the ``top_k``
    pieces by Viterbi usage count ``(piece, n_uses, cost_milli)``,
    ordered (n_uses desc, piece asc) — deterministic, full-oracle.

    Words longer than MAX_WORD characters are excluded from the round
    (SentencePiece's own max-sentencepiece-length discipline); single
    characters are always kept in the inventory so every word is
    segmentable.

    The per-word Viterbi runs as ONE codegen ``aggregate`` fold over the
    word's span-cost map (lattice edges collected into a map column):
    the fold appends (best, arg) per position at RUNTIME, so there is no
    per-level join (a first cut paid ~26 vocab-sized shuffle stages and
    was stage-overhead-bound at 5 s) and no unrolled expression tree (a
    column-per-level cut grows tribonacci-fast under CollapseProject).
    The backtrace is a second 12-step fold over the same array. Four
    shuffles total: words, piece counts, span maps, usage counts.
    """
    BIG = 1 << 50

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .filter((F.length("w") >= 1) & (F.length("w") <= MAX_WORD))
    )

    # candidate substrings with multiplicity: every (start i, len) span
    subs = (
        words.select(
            "w",
            "freq",
            F.explode(F.expr("sequence(0, length(w) - 1)")).alias("i"),
        )
        .select(
            "w",
            "freq",
            "i",
            F.explode(
                F.expr(f"sequence(1, least({MAX_PIECE}, length(w) - i))")
            ).alias("len"),
        )
        .select(
            "w",
            "freq",
            "i",
            (F.col("i") + F.col("len")).alias("j"),
            F.expr("substring(w, i + 1, len)").alias("p"),
            "len",
        )
    )

    cnts = subs.groupBy("p").agg(F.sum("freq").alias("cnt"))
    kept = cnts.filter((F.col("cnt") >= MIN_COUNT) | (F.length("p") == 1))
    total = kept.agg(F.sum("cnt").alias("t"))
    costs = (
        kept.crossJoin(F.broadcast(total))
        .select(
            "p",
            F.round(F.log(F.col("t").cast("double") / F.col("cnt")) * 1e3)
            .cast("long")
            .alias("cost_milli"),
        )
    )
    from .dedup import _persist

    costs = _persist(costs)  # 2 consumers (span map + final join); freed
    # by release_cached() like every other pinned intermediate

    # lattice edges per word as ONE map column: key i*16+j -> c16
    # (c16 = cost*16 + (MAX_PIECE - len): the longer-piece tie-break
    # lives in the integer objective itself)
    from ..plans.hints import broadcast_if_small

    wmap = (
        subs.join(broadcast_if_small(costs), "p")
        .groupBy("w", "freq")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("i") * 16 + F.col("j")).alias("k"),
                        (
                            F.col("cost_milli") * 16
                            + (F.lit(MAX_PIECE) - F.col("len"))
                        ).alias("v"),
                    )
                )
            ).alias("m")
        )
    )

    # forward Viterbi: fold j = 1..MAX_WORD appending (best, arg);
    # candidates checked smallest-i first so ties pick the smallest
    # start (same order the min(struct) oracle uses)
    def _merge(acc, x):
        cands = []
        for off in range(MAX_PIECE, 0, -1):  # i = x-4 .. x-1
            i = x - F.lit(off)
            c = F.when(
                i >= 0,
                F.try_element_at(acc, i + 1)["b"]
                + F.coalesce(
                    F.try_element_at(F.col("m"), i * 16 + x),
                    F.lit(BIG),
                ),
            )
            cands.append((c, i))
        mval = F.coalesce(F.least(*[c for c, _ in cands]), F.lit(BIG))
        arg_expr = None
        for c, i in cands:  # cands ordered i ascending: ties pick min i
            branch_val = i.cast("int")
            arg_expr = (
                F.when(c == mval, branch_val)
                if arg_expr is None
                else arg_expr.when(c == mval, branch_val)
            )
        return F.concat(
            acc,
            F.array(F.struct(mval.alias("b"), arg_expr.alias("a"))),
        )

    init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("b"), F.lit(-1).cast("int").alias("a")
        )
    )
    dp = wmap.withColumn(
        "dp",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(MAX_WORD)), init, _merge
        ),
    )

    # backtrace: fold walking pos -> arg, emitting one piece per step
    def _bt(acc, _x):
        pos = acc["pos"]
        arg = F.try_element_at(F.col("dp"), pos + 1)["a"]
        piece = F.col("w").substr(arg + 1, pos - arg)
        return F.when(
            pos > 0,
            F.struct(
                arg.alias("pos"),
                F.concat(acc["ps"], F.array(piece)).alias("ps"),
            ),
        ).otherwise(acc)

    binit = F.struct(
        F.length("w").cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
    )
    pieces = dp.select(
        "w",
        "freq",
        F.explode(
            F.aggregate(
                F.sequence(F.lit(1), F.lit(MAX_WORD)),
                binit,
                _bt,
                lambda acc: acc["ps"],
            )
        ).alias("p"),
    )

    if _emissions_only:
        return pieces, costs

    return (
        pieces.groupBy("p")
        .agg(F.sum("freq").cast("long").alias("n_uses"))
        .join(costs, "p")
        .select(F.col("p").alias("piece"), "n_uses", "cost_milli")
        .orderBy(F.col("n_uses").desc(), "piece")
        .limit(top_k)
    )


def unigram_lm_oracle_sql(top_k: int = 50, totals: bool = False) -> str:
    """DuckDB restatement: the identical lattice as MATERIALIZED
    per-level CTEs (the BPE-unroll precedent) — min(struct_pack(v, i))
    argmin, same integer c16 objective, same backtrace walk."""
    P, W, MC = MAX_PIECE, MAX_WORD, MIN_COUNT
    parts = [
        rf"""
    WITH words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
      GROUP BY 1 HAVING length(w) BETWEEN 1 AND {W}),
    subs AS MATERIALIZED (
      SELECT w, freq, i, i + len AS j, substring(w, i + 1, len) AS p, len
      FROM (SELECT w, freq, CAST(i AS INT) AS i, CAST(len AS INT) AS len
            FROM words,
                 generate_series(0, {W} - 1) t(i),
                 generate_series(1, {P}) t2(len)
            WHERE i < length(w) AND len <= length(w) - i)),
    cnts AS (SELECT p, sum(freq) AS cnt FROM subs GROUP BY 1),
    kept AS MATERIALIZED (
      SELECT p, cnt FROM cnts WHERE cnt >= {MC} OR length(p) = 1),
    tot AS (SELECT sum(cnt) AS t FROM kept),
    costs AS MATERIALIZED (
      SELECT p, CAST(round(ln(CAST((SELECT t FROM tot) AS DOUBLE) / cnt)
                           * 1000) AS BIGINT) AS cost_milli
      FROM kept),
    sc AS MATERIALIZED (
      SELECT s.w, s.i, s.j, c.cost_milli * 16 + ({P} - s.len) AS c16
      FROM subs s JOIN costs c USING (p)),
    dp0 AS (SELECT w, 0 AS j, CAST(0 AS BIGINT) AS best,
                   CAST(NULL AS INT) AS arg FROM words)"""
    ]
    for j in range(1, W + 1):
        lo = max(0, j - P)
        prev_union = " UNION ALL ".join(
            f"SELECT w, j, best FROM dp{i}" for i in range(lo, j)
        )
        parts.append(
            f""",
    dp{j} AS MATERIALIZED (
      SELECT w, {j} AS j, (m).v AS best, CAST((m).i AS INT) AS arg FROM (
        SELECT s.w,
               min(struct_pack(v := d.best + s.c16, i := s.i)) AS m
        FROM sc s JOIN ({prev_union}) d ON d.w = s.w AND d.j = s.i
        WHERE s.j = {j}
        GROUP BY s.w))"""
        )
    dp_union = " UNION ALL ".join(f"SELECT * FROM dp{j}" for j in range(W + 1))
    parts.append(
        f""",
    dp AS MATERIALIZED ({dp_union}),
    bt0 AS (SELECT wo.w, wo.freq, length(wo.w) AS pos, d.arg
            FROM words wo JOIN dp d ON d.w = wo.w AND d.j = length(wo.w))"""
    )
    for t in range(1, W):
        parts.append(
            f""",
    bt{t} AS (SELECT b.w, b.freq, b.arg AS pos, d.arg
              FROM bt{t - 1} b JOIN dp d ON d.w = b.w AND d.j = b.arg
              WHERE b.arg > 0)"""
        )
    em_union = " UNION ALL ".join(
        f"SELECT w, freq, substring(w, arg + 1, pos - arg) AS p FROM bt{t} "
        "WHERE arg IS NOT NULL"
        for t in range(W)
    )
    if totals:
        parts.append(
            f""",
    em AS ({em_union})
    SELECT 'unigram_lm' AS family,
           CAST(sum(freq) AS BIGINT) AS pieces,
           (SELECT CAST(sum(freq) AS BIGINT) FROM words
            WHERE length(w) >= 2) AS words_w,
           CAST((1000 * sum(freq))
                // (SELECT sum(freq) FROM words WHERE length(w) >= 2)
                AS BIGINT) AS pieces_per_kword
    FROM em WHERE length(w) >= 2"""
        )
        return "".join(parts)
    parts.append(
        f""",
    em AS ({em_union})
    SELECT em.p AS piece, CAST(sum(em.freq) AS BIGINT) AS n_uses,
           c.cost_milli
    FROM em JOIN costs c ON c.p = em.p
    GROUP BY 1, 3
    ORDER BY n_uses DESC, piece
    LIMIT {top_k}"""
    )
    return "".join(parts)


def unigram_lm_fertility(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-weighted Viterbi fertility of the unigram-LM round:
    total pieces / total word occurrences over the 2-12-char band —
    the third row of the subword-family comparison
    (`subword_fertility_report` covers BPE/WordPiece; unigram segments
    by likelihood, so its fertility comes from the SAME Viterbi
    trajectory `unigram_lm_top_pieces` verifies). One scan + the
    vocab-sized folds."""
    pieces, _costs = unigram_lm_piece_counts(
        docs, text_col, _emissions_only=True
    )
    band = pieces.filter(F.length("w") >= 2)
    return band.agg(
        F.sum("freq").cast("long").alias("pieces"),
    ).crossJoin(
        band.select("w", "freq")
        .groupBy("w")
        .agg(F.first("freq").alias("f"))
        .agg(F.sum("f").cast("long").alias("words_w"))
    ).select(
        F.lit("unigram_lm").alias("family"),
        "pieces",
        "words_w",
        F.expr("(1000 * pieces) div words_w").cast("long").alias(
            "pieces_per_kword"
        ),
    )
