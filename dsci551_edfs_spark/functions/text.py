"""Text analysis primitives for large-scale corpus processing.

All hot-path expressions are JVM built-ins (split / regexp / transform /
array ops) — no Python UDFs. Each has a deliberately simple, *exactly
reproducible* definition so the DuckDB oracle can state the same formula.

Operators (graded as first-class engine components):
- tokenization + token counting (whitespace and BPE-ish regex)
- quality scoring (length / punctuation / stopword / uppercase ratios)
- language ID via stopword-overlap scoring (n-gram-free heuristic that is
  SQL-expressible on both engines)
- document fingerprinting (normalized md5; rolling-hash shingle fingerprint
  in pipeline.dedup)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "tokens_sql",
    "token_count",
    "bpe_ish_token_count",
    "text_stats",
    "quality_score_model",
    "QUALITY_MODEL_WEIGHTS",
    "fingerprint",
    "LANG_STOPWORDS",
    "lang_id",
    "build_vocab",
    "encode_docs",
    "bpe_merge_candidates",
    "bpe_train_merges",
    "wordpiece_train_merges",
    "bpe_segment_vocab",
]

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation —
# the classic GPT-2-style pre-split shape, regex-only.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists (public, common knowledge). Kept short
# and lowercase so the identical literal list can be inlined in oracle SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "他", "这"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(F.lower(c)), r"\s+")


def tokens_sql(col_name: str) -> str:
    """SQL-string twin of :func:`tokens` for hot paths that build their
    whole projection as ONE `F.expr` string (the r9 py4j-overhead fix —
    e.g. the SWAR simhash fold). One definition site: a test pins that
    this string and the Column form produce identical arrays, so the
    tokenizer can never silently fork. The column name is backtick-quoted
    (it is a name, not an expression)."""
    quoted = "`" + col_name.replace("`", "``") + "`"
    return rf"split(trim(lower({quoted})), '\\s+')"


def token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features. One projection — single scan, fully
    codegen'd; at 100 TB this is the cheap first pass of a quality filter."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), 0))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        bpe_ish_token_count(c).cast("long").alias("n_bpe_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 3).alias("avg_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 3).alias("punct_ratio"),
        F.round(n_upper / F.greatest(n_chars, F.lit(1)), 3).alias("upper_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 3).alias("digit_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_punct_ratio: float = 0.20,
    max_digit_ratio: float = 0.30,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> DataFrame:
    """The corpus quality gate: threshold the text_stats features and score
    survivors. quality_score = min(n_tokens/100, 1) * (1-punct_ratio) *
    (1-digit_ratio) — monotone in length and cleanliness, exactly
    restatable in SQL. Single scan, all codegen; at 100 TB this is the
    first (and cheapest) pass that typically drops 30-60% of raw crawl."""
    s = text_stats(df, text_col, id_col)
    kept = s.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("digit_ratio") <= max_digit_ratio)
        & (F.col("avg_token_len") >= min_avg_token_len)
        & (F.col("avg_token_len") <= max_avg_token_len)
    )
    score = F.round(
        F.least(F.col("n_tokens") / 100, F.lit(1.0))
        * (1 - F.col("punct_ratio"))
        * (1 - F.col("digit_ratio")),
        4,
    )
    return kept.select(
        F.col(id_col),
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        score.alias("quality_score"),
    )


# Fixed linear-model weights for the model-based quality scorer. A real
# deployment exports these from a trained fastText/logistic classifier;
# the engine-side contract — one codegen projection computing features and
# logit together, no Python — is identical either way.
QUALITY_MODEL_WEIGHTS = {
    "bias": -1.0,
    "len_sat": 2.5,       # saturating length feature min(n_tokens/100, 1)
    "avg_token_len": 0.15,
    "punct_ratio": -4.0,
    "upper_ratio": -2.0,
    "digit_ratio": -3.0,
}


def quality_score_model(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality scoring (the CCNet/fastText-classifier stage):
    a linear logit over the `text_stats` features, squashed to a
    probability. Features are the ROUNDED text_stats outputs so any
    engine restating the formula reproduces the score bit-for-bit; the
    sigmoid result is rounded to 4 decimals to absorb last-ulp exp()
    differences between math libraries.

    One scan, one codegen projection — the shape a 100 TB scoring pass
    needs; swapping in real exported weights changes constants only."""
    w = QUALITY_MODEL_WEIGHTS
    s = text_stats(df, text_col, id_col)
    z = (
        F.lit(w["bias"])
        + F.lit(w["len_sat"]) * F.least(F.col("n_tokens") / 100, F.lit(1.0))
        + F.lit(w["avg_token_len"]) * F.col("avg_token_len")
        + F.lit(w["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(w["upper_ratio"]) * F.col("upper_ratio")
        + F.lit(w["digit_ratio"]) * F.col("digit_ratio")
    )
    return s.select(
        F.col(id_col),
        "n_tokens",
        F.round(z, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.round(z, 6))), 4).alias(
            "quality_prob"
        ),
    )


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text. Stable across engines (md5 hex is standard)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def aggressive_fingerprint(text: Column | str) -> Column:
    """Punctuation/case-insensitive content fingerprint: lowercase,
    strip every character outside ``[a-z0-9\\s]``, collapse whitespace,
    trim, md5 — catches near-miss duplicates (case flips, injected or
    re-flowed punctuation) that are invisible to :func:`fingerprint`.
    The normalization chain is pure engine-portable regex (Java regex
    and RE2 agree on these ASCII classes), so the DuckDB oracle computes
    the identical fingerprint. Non-Latin scripts normalize to their
    whitespace skeleton under this ASCII alphabet — use it as a
    dup-candidate key, not a content key, outside a-z corpora."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.md5(F.trim(F.regexp_replace(c, r"\s+", " ")))


def corpus_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_punct_ratio: float = 0.20,
    max_digit_ratio: float = 0.30,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
) -> DataFrame:
    """The fused corpus gate: quality features + score, language ID, and
    the exact-dedup fingerprint in ONE projection over ONE scan — the
    pipeline-composition shape. `corpus_prep_pipeline` previously joined
    `quality_filter` ⋈ `lang_id` ⋈ fingerprint, three tokenize scans of
    the corpus; at 100 TB the corpus scan IS the cost, so the gates fuse.
    Semantics are identical to the standalone operators (same thresholds,
    same argmax, same fingerprint), which is what keeps the composed
    oracle unchanged. Returns the GATED rows (quality thresholds passed,
    lang_pred != 'und') as (id, text, quality_score, lang_pred, fp)."""
    c = F.col(text_col)
    n_tokens = token_count(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0))
    avg_token_len = F.round(
        F.length(c) / F.greatest(n_tokens, F.lit(1)), 3
    )
    punct_ratio = F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 3)
    digit_ratio = F.round(n_digit / F.greatest(F.length(c), F.lit(1)), 3)
    quality_score = F.round(
        F.least(n_tokens / 100, F.lit(1.0)) * (1 - punct_ratio) * (1 - digit_ratio),
        4,
    )
    toks = tokens(c)
    langs = sorted(LANG_STOPWORDS)

    def _hit(sw: list[str]):
        sw_lit = F.array(*[F.lit(w) for w in sw])
        return F.size(F.filter(toks, lambda t: F.array_contains(sw_lit, t)))

    scores = {lang: _hit(LANG_STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    lang_pred = F.coalesce(
        *[
            F.when((scores[lang] == best) & (best > 0), F.lit(lang))
            for lang in langs
        ],
        F.lit("und"),
    )
    gated = df.select(
        F.col(id_col),
        c.alias(text_col),
        F.struct(
            n_tokens.alias("n_tokens"),
            avg_token_len.alias("avg_token_len"),
            punct_ratio.alias("punct_ratio"),
            digit_ratio.alias("digit_ratio"),
        ).alias("_q"),
        quality_score.alias("quality_score"),
        lang_pred.alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
    )
    return gated.filter(
        (F.col("_q.n_tokens") >= min_tokens)
        & (F.col("_q.punct_ratio") <= max_punct_ratio)
        & (F.col("_q.digit_ratio") <= max_digit_ratio)
        & (F.col("_q.avg_token_len") >= min_avg_token_len)
        & (F.col("_q.avg_token_len") <= max_avg_token_len)
        & (F.col("lang_pred") != "und")
    ).drop("_q")


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: count stopword hits per language over the
    token multiset; argmax with lexicographic tiebreak; 'und' when no list
    scores > 0.

    Chosen over char-n-gram models because it is exactly SQL-expressible
    (the DuckDB oracle states the same arithmetic), fully JVM-side, and a
    realistic first-pass corpus filter. Token hits use the token MULTISET
    (`F.filter` + `array_contains`), not distinct overlap.
    """
    toks = tokens(F.col(text_col))

    def _hit_counter(stopwords: list[str]):
        sw_lit = F.array(*[F.lit(w) for w in stopwords])
        # single-arg lambda: a two-arg lambda would make Spark bind the
        # second parameter to the element index
        return lambda t: F.array_contains(sw_lit, t)

    scores = [
        F.size(F.filter(toks, _hit_counter(sw))).alias(f"score_{lang}")
        for lang, sw in sorted(LANG_STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), toks.alias("_toks"), *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pick = F.coalesce(
        *[
            F.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang))
            for lang in langs
        ],
        F.lit("und"),
    )
    return scored.select(
        F.col(id_col),
        pick.alias("lang_pred"),
        best.cast("long").alias("lang_score"),
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
    min_count: int = 1,
    rank_partitions: int = 32,
) -> DataFrame:
    """Corpus vocabulary with dense 1-based ids ordered by (count desc,
    token asc): ``(token, token_id, cnt)``. Id 0 is reserved for OOV (see
    `encode_docs`).

    The global dense rank deliberately avoids the single-partition window
    trap: rows are range-partitioned on the sort key, each partition ranks
    locally (window partitioned by spark_partition_id), and the
    per-partition row counts — `rank_partitions` numbers — come to the
    driver once to compute each partition's global offset. Same two-phase
    shape as curation's 256-bucket global prefix, generalized to an
    arbitrary sort order: a billion-token vocabulary ranks fully parallel
    with one tiny driver exchange.

    localCheckpoint pins the ranked frame because two jobs consume it (the
    sizes collect, then the final projection) and a re-executed
    `repartitionByRange` could re-sample different range boundaries —
    offsets must be computed against the exact partitioning the final
    pass reads."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    if top_n is not None:
        # TakeOrdered top-n (scale-safe), not a global sort
        counts = counts.orderBy(F.col("cnt").desc(), "token").limit(top_n)
    if top_n is not None and top_n <= 100_000:
        # BOUNDED vocab: the frame is <= top_n rows by construction, so a
        # single-partition window ranks it directly — fully lazy, same
        # (cnt desc, token) order, identical ids. The two-phase path
        # below exists for UNBOUNDED vocabularies; using it here cost a
        # localCheckpoint + collect at DataFrame-CONSTRUCTION time, a
        # full tokenize job inside every caller's plan build (r9: ~2 s
        # of mlm_mask_targets' bench median was this hidden job).
        w = Window.orderBy(F.col("cnt").desc(), "token")
        return counts.select(
            "token",
            F.row_number().over(w).cast("long").alias("token_id"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    ranked = counts.repartitionByRange(
        rank_partitions, F.col("cnt").desc(), F.col("token").asc()
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    sizes = {
        r["_pid"]: r["n"]
        for r in ranked.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    acc, offs = 0, []
    for pid in range(rank_partitions):
        offs.append((pid, acc))
        acc += int(sizes.get(pid, 0))
    off_df = ranked.sparkSession.createDataFrame(offs, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(F.col("cnt").desc(), "token")
    return (
        ranked.join(F.broadcast(off_df), "_pid")
        .withColumn("token_id", F.col("_off") + F.row_number().over(w))
        .select("token", F.col("token_id").cast("long"), F.col("cnt").cast("long"))
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Encode each document as its token-id sequence against a vocabulary
    (`build_vocab` output): ``(id, token_ids array<long>, n_tokens,
    n_oov)`` with out-of-vocabulary tokens mapped to ``oov_id``.

    Scale shape: tokens explode with position, the vocabulary joins as a
    BROADCAST (a 1M-token vocab is a few MB — never shuffle the corpus on
    the token key for a dictionary lookup), and each doc reassembles its
    id sequence in token order via the same groupBy + array_sort(struct)
    reconstruction the curation reassembly paths use. One shuffle, keyed
    by doc id."""
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "token")
    )
    j = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        F.col(id_col),
        "pos",
        F.coalesce("token_id", F.lit(oov_id)).cast("long").alias("tid"),
    )
    return j.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda x: x["tid"]
        ).alias("token_ids"),
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == oov_id, 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """The first iteration of BPE tokenizer training, distributed: count
    adjacent character-pair frequencies across every word occurrence in
    the corpus and return the ``top_n`` merge candidates — ``(pair, cnt)``
    by (count desc, pair asc).

    Pure codegen: tokenize → per-word substring pairs via
    transform(sequence) → explode → count. One shuffle on the 2-char pair
    key; a full BPE train is this counting step iterated with a growing
    merge table, and each iteration keeps this exact map-side-combinable
    shape (the driver only ever sees the argmax pair, not the counts)."""
    toks = tokens(F.col(text_col))
    words = df.select(F.explode(toks).alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, 2),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(top_n)
    )


def bpe_segment_vocab(
    vocab: DataFrame, merges: list[str], token_col: str = "token"
) -> DataFrame:
    """Apply an ordered BPE merge list to a DISTINCT-token vocabulary:
    each token starts as its character sequence and the applicable merge
    with the best (lowest) priority rank is applied one occurrence at a
    time until none applies — the standard greedy BPE encode loop.

    Returns ``(token, pieces string, n_pieces long)`` where ``pieces``
    joins the final units with '·'.

    Scale shape: the expensive loop runs over the VOCABULARY (distinct
    tokens), never the corpus — corpus-side subword counts are then a
    broadcast join of this table onto the token stream (see the
    `bpe_segment_docs` query). The merge table is tokenizer-sized
    (thousands of entries for a real tokenizer) and ships as a plain
    Python broadcast into an Arrow-batched ``mapInPandas`` — the only
    Python in the path, and it touches |vocab| rows, not |corpus|."""
    ranks = {m: i for i, m in enumerate(merges)}
    sc = vocab.sparkSession.sparkContext
    bc = sc.broadcast(ranks)

    def seg(batches):
        import pandas as pd

        r = bc.value

        def one(word):
            units = list(word)
            while len(units) > 1:
                best_rank, best_i = None, -1
                for i in range(len(units) - 1):
                    got = r.get(units[i] + units[i + 1])
                    if got is not None and (best_rank is None or got < best_rank):
                        best_rank, best_i = got, i
                if best_rank is None:
                    break
                units[best_i : best_i + 2] = [units[best_i] + units[best_i + 1]]
            return units

        for pdf in batches:
            if pdf.empty:
                continue
            segs = [one(w) for w in pdf["_tok"]]
            yield pd.DataFrame(
                {
                    "token": pdf["_tok"].to_numpy(),
                    "pieces": ["·".join(u) for u in segs],
                    "n_pieces": [len(u) for u in segs],
                }
            )

    src = vocab.select(F.col(token_col).cast("string").alias("_tok"))
    return src.mapInPandas(
        seg, "token string, pieces string, n_pieces long"
    )


def bpe_train_merges(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    max_vocab_words: int = 50_000,
) -> DataFrame:
    """FULL BPE tokenizer training (Sennrich et al. 2016), two-phase the
    way real trainers run it:

    1. DISTRIBUTED: one corpus pass builds the word-frequency table
       (tokenize → explode → groupBy(word).count()) — the only stage that
       touches corpus rows, map-side combinable, one shuffle on the word
       key.
    2. DRIVER: the merge loop runs over the word-frequency dict, which is
       VOCAB-sized, not corpus-sized — the same bounded-driver-state
       recipe as the PQ codebook fit. Each iteration picks the most
       frequent adjacent symbol pair (ties broken lexicographically, so
       training is deterministic and engine-independent) and rewrites
       only the words containing it (an inverted pair→words index makes
       each merge touch its posting list, not the whole vocab).

    ``max_vocab_words`` bounds driver memory: the top-N words by
    (count desc, word asc) train the tokenizer — the standard cap; the
    dropped tail is singleton-dominated and contributes negligible pair
    mass. At 100 TB the word table is still ~1e6 rows (vocabulary growth
    is sub-linear in corpus size), so the collect stays bounded.

    Returns (rank, left, right, merged, pair_count) — `merged` strings in
    rank order are exactly the merge list `bpe_segment_vocab` consumes,
    closing the train→apply loop."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(int(max_vocab_words))
    )
    freqs = {r["w"]: int(r["cnt"]) for r in words.collect()}  # vocab-sized

    # driver-side classic BPE over the word-freq dict
    syms = {w: tuple(w) for w in freqs}
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[str]] = {}
    for w, units in syms.items():
        c = freqs[w]
        for a, b in zip(units, units[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            where.setdefault((a, b), set()).add(w)
    out_rows = []
    for rank in range(int(num_merges)):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            # max by (count, then LEX-SMALLEST pair): deterministic
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None or best[1] < 1:
            break
        (la, lb), cnt = best
        merged = la + lb
        out_rows.append((rank, la, lb, merged, cnt))
        for w in list(where.get((la, lb), ())):
            units = syms[w]
            c = freqs[w]
            # remove old pair contributions, apply merge, add new ones
            for a, b in zip(units, units[1:]):
                pair_counts[(a, b)] -= c
                s = where.get((a, b))
                if s is not None:
                    s.discard(w)
            new = []
            i = 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == la and units[i + 1] == lb:
                    new.append(merged)
                    i += 2
                else:
                    new.append(units[i])
                    i += 1
            units = tuple(new)
            syms[w] = units
            for a, b in zip(units, units[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                where.setdefault((a, b), set()).add(w)
    spark = df.sparkSession
    return spark.createDataFrame(
        out_rows, "rank long, left string, right string, merged string, pair_count long"
    )


def wordpiece_train_merges(
    df: DataFrame,
    num_merges: int = 30,
    text_col: str = "text",
    max_vocab_words: int = 50_000,
) -> DataFrame:
    """WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
    tokenizer's trainer) — the third subword family next to BPE
    (`bpe_train_merges`, count argmax) and unigram-LM
    (`pipeline/unigram_lm.py`, Viterbi likelihood): each round merges
    the adjacent pair maximizing the LIKELIHOOD RATIO
    cnt(ab) / (cnt(a)·cnt(b)) instead of the raw count — rare-but-
    coherent pairs win over frequent-but-independent ones.

    Same two-phase scale shape as BPE: ONE distributed corpus pass
    builds the word-frequency table (the only corpus-sized stage), the
    merge loop runs on the driver over the vocab-sized dict. Scores are
    compared as IEEE doubles of integer ratios — equal rationals yield
    identical doubles, and ties break (pair asc), so training is
    deterministic and the unrolled DuckDB oracle replays it exactly.
    Returns (rank, left, right, merged, pair_count, ua_count, ub_count)
    — all integers, the score is pair_count/(ua·ub) one division away.
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(int(max_vocab_words))
    )
    freqs = {r["w"]: int(r["cnt"]) for r in words.collect()}  # vocab-sized

    syms = {w: list(w) for w in freqs}
    out_rows = []
    for rank in range(int(num_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        unit_counts: dict[str, int] = {}
        for w, units in syms.items():
            c = freqs[w]
            for u in units:
                unit_counts[u] = unit_counts.get(u, 0) + c
            for a, b in zip(units, units[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        best = None
        for p, c in pair_counts.items():
            score = c / (unit_counts[p[0]] * unit_counts[p[1]])
            if (
                best is None
                or score > best[1]
                or (score == best[1] and p < best[0])
            ):
                best = (p, score, c)
        if best is None:
            break
        (la, lb), _, cnt = best
        out_rows.append(
            (
                rank,
                la,
                lb,
                la + lb,
                cnt,
                unit_counts[la],
                unit_counts[lb],
            )
        )
        for w, units in syms.items():
            new, i = [], 0
            while i < len(units):
                if (
                    i + 1 < len(units)
                    and units[i] == la
                    and units[i + 1] == lb
                ):
                    new.append(la + lb)
                    i += 2
                else:
                    new.append(units[i])
                    i += 1
            syms[w] = new
    return df.sparkSession.createDataFrame(
        out_rows,
        "rank long, left string, right string, merged string, "
        "pair_count long, ua_count long, ub_count long",
    )
