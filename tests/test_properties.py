"""Property-based invariants (hypothesis): engine ops vs independent
reference implementations on randomized inputs. Examples are batched into
one DataFrame per case and capped — each example crosses the JVM."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dsci551_edfs_spark.functions import text as TXT
from dsci551_edfs_spark.operators.temporal import asof_join
from dsci551_edfs_spark.pipeline import dedup as DD

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"), max_codepoint=0x2FF),
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@SLOW
@given(texts)
def test_exact_dedup_idempotent(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    once = DD.exact_dedup(df)
    twice = DD.exact_dedup(once)
    assert sorted(r["doc_id"] for r in once.collect()) == sorted(
        r["doc_id"] for r in twice.collect()
    )


def _ref_token_count(t: str) -> int:
    """Independent restatement of the engine contract: trim spaces, split
    on ASCII whitespace runs (Java/DuckDB `\\s` is ASCII-only — U+00A0 and
    friends are NOT separators, unlike Python's str.split())."""
    import re

    trimmed = t.strip(" ")
    if trimmed == "":
        return 0
    return len(re.split(r"\s+", trimmed, flags=re.ASCII))


@SLOW
@given(texts)
def test_token_count_matches_python(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", TXT.token_count("text").alias("n")).collect()
    }
    for i, t in enumerate(ts):
        assert got[i] == _ref_token_count(t), repr(t)


ascii_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60),
    min_size=1,
    max_size=12,
)


@SLOW
@given(ascii_texts)
def test_fingerprint_normalization_invariant(spark, ts):
    """ASCII only: Unicode special casing (e.g. U+0149 upper-expands to two
    chars) legitimately changes the fingerprint and is out of contract."""
    rows = [(i, t, " ".join(t.upper().split())) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "doc_id long, a string, b string")
    bad = df.filter(
        TXT.fingerprint(F.col("a")) != TXT.fingerprint(F.col("b"))
    ).count()
    assert bad == 0


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000), st.floats(0, 100)),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    from datetime import datetime, timedelta

    def dt(t):
        return datetime(2024, 1, 1) + timedelta(seconds=t)

    left = spark.createDataFrame(
        [(k, dt(t)) for k, t in lrows], "key long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, dt(t), v) for k, t, v in rrows],
        "key long, ts timestamp, px double",
    )
    got = {
        (r["key"], r["ts"]): r["px_right"]
        for r in asof_join(left, right, on="key").collect()
    }
    lp = pd.DataFrame([(k, dt(t)) for k, t in lrows],
                      columns=["key", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame([(k, dt(t), v) for k, t, v in rrows],
                      columns=["key", "ts", "px"]).sort_values("ts", kind="stable")
    want = pd.merge_asof(lp, rp, on="ts", by="key", direction="backward")
    for _, row in want.iterrows():
        spark_px = got[(row["key"], row["ts"])]
        if pd.isna(row["px"]):
            assert spark_px is None
        else:
            assert spark_px == pytest.approx(row["px"])


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=30, unique=True))
def test_curation_split_matches_reference_md5(spark, ids):
    """deterministic_split vs an independent hashlib restatement of the
    bucket formula (first 4 md5-hex chars as int, mod 100)."""
    import hashlib

    from dsci551_edfs_spark.pipeline import curation as CUR

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in CUR.deterministic_split(df).collect()}
    for i in ids:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert got[i] == want, (i, b, got[i], want)


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=20))
def test_pack_sequences_matches_sequential_reference(spark, tok_counts):
    """pack_id == floor(start_offset / target) where start offsets are the
    sequential prefix sum in (md5(id), id) order — the distributed
    two-phase prefix sum must equal the plain sequential loop."""
    import hashlib

    from dsci551_edfs_spark.pipeline import curation as CUR

    rows = [(i, " ".join(["t"] * n) if n else "") for i, n in enumerate(tok_counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pack_id"] for r in CUR.pack_sequences(df, target_tokens=64).collect()}
    assert len(out) == len(tok_counts)
    order = sorted(range(len(tok_counts)),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    offset = 0
    for i in order:
        assert out[i] == offset // 64, (i, out[i], offset)
        offset += tok_counts[i]


@SLOW
@given(st.lists(st.text(alphabet="abcdefgh ", min_size=1, max_size=30),
                min_size=1, max_size=20))
def test_bloom_never_false_negative(spark, docs_texts):
    """Any inserted fingerprint must test positive — for arbitrary text."""
    import numpy as np

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs_texts)), "text": docs_texts})
    )
    bits = DD.build_fingerprint_bloom(df, num_bits=1 << 12, num_hashes=4)
    h1c, h2c = DD._bloom_hashes(DD.fingerprint("text"))
    hashes = df.select(h1c.alias("h1"), h2c.alias("h2")).toPandas()
    a = hashes["h1"].to_numpy().astype(np.uint64)
    c = hashes["h2"].to_numpy().astype(np.uint64)
    mask = np.uint64((1 << 12) - 1)
    res = np.ones(len(a), dtype=bool)
    for i in range(4):
        idx = (a + np.uint64(i) * c) & mask
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        res &= ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1) == 1
    assert res.all()


@SLOW
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=1, max_size=50))
def test_zvalue_interleave_bijective(spark, pairs):
    """z = interleave(a, b) must be invertible: deinterleaving the even /
    odd bits recovers (a, b) exactly — for arbitrary 16-bit inputs."""
    from dsci551_edfs_spark.sources.layout import zvalue16

    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b"]))
    got = df.select("a", "b", zvalue16(F.col("a"), F.col("b")).alias("z")).collect()

    def deinterleave(z):
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in got:
        assert deinterleave(r["z"]) == (r["a"], r["b"])


@SLOW
@given(st.lists(st.text(alphabet="xyz ", min_size=1, max_size=80),
                min_size=1, max_size=10),
       st.integers(2, 8), st.integers(1, 8))
def test_chunking_covers_all_tokens(spark, docs_texts, chunk, stride):
    """Every token index must be covered by >= 1 chunk, first chunks start
    at 0, and reassembling stride-aligned chunks recovers the doc."""
    from dsci551_edfs_spark.functions.text import tokens as tok_expr
    from dsci551_edfs_spark.pipeline.curation import chunk_documents

    stride = min(stride, chunk)  # overlap requires stride <= chunk
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs_texts)), "text": docs_texts})
    )
    toks = {r["doc_id"]: [t for t in r["t"] if t != ""]
            for r in df.select("doc_id", tok_expr("text").alias("t")).collect()}
    out = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, expected in toks.items():
        if not expected:
            continue
        rows = sorted(by_doc[did], key=lambda r: r["chunk_idx"])
        assert rows[0]["chunk_idx"] == 0
        covered = set()
        for r in rows:
            start = r["chunk_idx"] * stride
            got_toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert got_toks == expected[start : start + chunk]
            covered.update(range(start, min(start + chunk, len(expected))))
        assert covered == set(range(len(expected)))


def test_exactness_queries_partitioning_invariant(spark, sf_dir):
    """The exactness discipline's actual claim, pinned: every log/prob/
    iterative op reduces over integer micro-nat or exact-decimal sums, so
    results are bit-identical under a different parallelism — the
    property that makes them hash-checkable against a second engine and
    safe to re-run incrementally. Run a representative query per family
    at 3 vs 32 shuffle partitions and require identical row sets."""
    from dsci551_edfs_spark.queries import QUERIES

    names = [
        "doc_perplexity_lm",      # bigram LM micro-nats
        "pmi_collocations",       # PMI micro-nats
        "trend_per_event_type",   # OLS decimal sufficient stats
        "pagerank_user_events",   # iterative integer ranks
        "token_drift_report",     # KL nano-nats
        "dsir_scores",            # importance micro-nats
    ]

    def run_all(n_parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            out = {}
            for n in names:
                rows = QUERIES[n](spark, sf_dir).collect()
                out[n] = sorted(tuple(r) for r in rows)
                DD.release_cached()
            return out
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")

    wide, narrow = run_all(32), run_all(3)
    for n in names:
        assert wide[n] == narrow[n], f"{n} differs across partitionings"


@given(
    big=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),                  # token
            st.integers(min_value=2_000_000_000, max_value=3_000_000_000),
        ),
        min_size=3,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    small=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),                  # doc
            st.integers(min_value=0, max_value=5),                  # token
            st.integers(min_value=1, max_value=1000),               # weight
        ),
        min_size=2,
        max_size=10,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_cosine_pairs_exact_at_adversarial_magnitudes(spark, big, small):
    """Overflow contract for the tf-idf pair stage: doc 0 carries weights
    up to 3e9, so a single w² is ~9e18 (the int64 edge) and its Σw² far
    exceeds it — a long-typed aggregation would silently WRAP Spark-side
    while DuckDB promotes to HUGEINT. The DECIMAL(38,0) accumulation must
    match exact Python bignum arithmetic bit-for-bit — sums AND threshold
    decisions (dot²·10⁶ ≥ t²·na²·nb², t=500 ⇔ cos ≥ 0.5). Small docs 1-3
    keep the cross products inside the 38-digit exact-compare envelope
    (the same ceiling the HUGEINT oracle has)."""
    rows = [(0, t, w) for t, w in big] + list(small)
    w_df = spark.createDataFrame(
        [(d, f"t{t}", w) for d, t, w in rows], "doc_id long, token string, w long"
    )
    out = {
        (r["doc_a"], r["doc_b"]): (int(r["dot_w"]), int(r["na2"]), int(r["nb2"]))
        for r in DD.cosine_pairs_from_weights(w_df, threshold_milli=500).collect()
    }

    # exact reference on Python bignums
    from collections import defaultdict

    vec = defaultdict(dict)
    for d, t, w in rows:
        vec[d][t] = w
    expect = {}
    docs = sorted(vec)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            dot = sum(vec[a][t] * vec[b][t] for t in vec[a] if t in vec[b])
            na2 = sum(w * w for w in vec[a].values())
            nb2 = sum(w * w for w in vec[b].values())
            if dot > 0 and dot * dot * 1_000_000 >= 250_000 * na2 * nb2:
                expect[(a, b)] = (dot, na2, nb2)
    assert out == expect
    # the giant doc's norm really exceeded int64 (else this test proves
    # nothing about wrap protection)
    assert sum(w * w for w in vec[0].values()) > 2**63


def test_cosine_pairs_fail_loud_beyond_envelope(spark):
    """Past 38 digits the threshold products cannot be represented —
    BOTH engines must refuse rather than mis-decide: DuckDB HUGEINT
    errors out of range, Spark ANSI throws. Pin the Spark side: two
    huge-norm docs sharing a token raise, never return a wrong row."""
    import pytest as _pt

    rows = [(0, "t", 3_000_000_000), (0, "u", 3_000_000_000),
            (1, "t", 2_999_999_999), (1, "u", 2_999_999_999)]
    w_df = spark.createDataFrame(rows, "doc_id long, token string, w long")
    with _pt.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Decimal"):
        DD.cosine_pairs_from_weights(w_df, threshold_milli=500).collect()


def test_round6_numeric_ops_partitioning_invariant(spark, sf_dir):
    """Same exactness pin for the round-6 numeric families: Gram moments
    (int64 matmul partials), BM25 eval metrics (micro divisions of exact
    integers), robust MAD z-scores (rank-formula medians), CUSUM
    (integer deviations through the two-phase running sum), and the MLM
    corruption (md5 masks + vocab-rank join) must be bit-identical at
    3 vs 32 shuffle partitions."""
    from dsci551_edfs_spark.queries import QUERIES

    names = [
        "embedding_gram_matrix",
        "retrieval_eval_metrics",
        "event_rate_anomalies_robust",
        "changepoint_cusum",
        "mlm_mask_targets",
        "quantile_histogram_rollup",
    ]

    def run_all(n_parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            out = {}
            for n in names:
                rows = QUERIES[n](spark, sf_dir).collect()
                out[n] = sorted(tuple(r) for r in rows)
                DD.release_cached()
            return out
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")

    wide, narrow = run_all(32), run_all(3)
    for n in names:
        assert wide[n] == narrow[n], f"{n} differs across partitionings"


@SLOW
@given(
    st.lists(
        st.text(alphabet="abcdefgh ", min_size=1, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_minhash_affine_family_matches_python(spark, ts):
    """Round-8 oracle family: Spark's md5-prefix + affine (a·h+b mod
    2^31−1) minhash signatures must equal a pure-Python recomputation
    per row — the same parity the DuckDB oracles rely on, pinned at the
    single-document level on randomized text."""
    import hashlib

    rows = [(i, t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.shingle_df(df, "text", "doc_id", n=3)
    got = {
        r["id"]: list(r["sig"])
        for r in DD.minhash_signature(sh, 8, 42, hash_family="md5").collect()
    }
    params = DD.minhash_affine_params(8, 42)
    p = DD.MINHASH_PRIME
    ref_sh = {r["id"]: r["shingles"] for r in sh.collect()}
    for i, shingles in ref_sh.items():
        mins = [None] * 8
        for s in shingles:
            h0 = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            for j, (a, b) in enumerate(params):
                v = (a * h0 + b) % p
                if mins[j] is None or v < mins[j]:
                    mins[j] = v
        assert got[i] == mins, (i, shingles)


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200))
def test_hll_own_matches_python_reference(spark, vals):
    """Round-8 oracle-checked HLL: register table and rounded estimate
    must equal a pure-Python recomputation (same md5-prefix hash, same
    bucket/rho arithmetic, same harmonic + linear-counting estimate) on
    randomized value lists."""
    import hashlib
    import math

    from dsci551_edfs_spark.operators import sketches as SK

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    regs = {
        r["bucket"]: r["reg"]
        for r in SK.hll_own_registers(df, "v", p=9).collect()
    }
    est = SK.hll_own_estimate(
        SK.hll_own_registers(df, "v", p=9), p=9
    ).first()["ndv_est"]

    m, w_bits = 512, 39
    ref: dict = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
        bucket, w = h & (m - 1), h >> 9
        rho = (w_bits - w.bit_length() + 1) if w else (w_bits + 1)
        ref[bucket] = max(ref.get(bucket, 0), rho)
    assert regs == ref
    s = sum(2.0 ** -r for r in ref.values()) + (m - len(ref))
    raw = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m) / s
    zeros = m - len(ref)
    e = float(m) * math.log(float(m) / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    assert est == pytest.approx(round(e, 3), abs=2e-3)


# ------------------------------------------------- r10: containment


def _ref_shingles(text: str, n: int = 3) -> set:
    """Pure-Python restatement of shingle_df's contract: lowercase, trim
    ASCII spaces, split on ASCII \\s+ (Java semantics: a leading \\t
    survives trim and yields a leading '' token), distinct word n-grams
    joined by single spaces; docs with < n tokens contribute their full
    token string as one shingle."""
    import re

    t = text.lower().strip(" ")
    toks = re.split(r"\s+", t, flags=re.ASCII)
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _ref_containment(docs, n, threshold, max_df=None):
    """Brute-force containment pairs: |∩|/min(|A|,|B|) over distinct
    shingle SETS, with the engine's cap semantics — DF-1 pruning is
    lossless (an intersecting shingle has df >= 2); max_df excludes
    over-frequent shingles from |∩| but never from the sizes."""
    from collections import Counter

    sh = {i: _ref_shingles(t, n) for i, t in docs}
    dfc = Counter(g for s in sh.values() for g in s)
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sh[ids[x]], sh[ids[y]]
            inter = sum(
                1 for g in a & b if max_df is None or dfc[g] <= max_df
            )
            c = inter / min(len(a), len(b))
            if c >= threshold:
                out[(ids[x], ids[y])] = c
    return out


cont_texts = st.lists(
    st.text(alphabet="ab cd\tef", min_size=1, max_size=40),
    min_size=2,
    max_size=8,
)


@SLOW
@given(cont_texts, st.sampled_from([None, 2, 4]))
def test_containment_matches_python_reference(spark, ts, max_df):
    # plant the doc-inside-doc case Jaccard misses: the last doc embeds
    # the first verbatim inside filler, so containment(first, last) is
    # high while their Jaccard is small
    corpus = list(enumerate(ts))
    corpus.append((len(ts), "filler one two three " + ts[0] + " four five"))
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in DD.containment_dup_pairs(
            df, threshold=0.2, max_df=max_df
        ).collect()
    }
    want = _ref_containment(corpus, n=3, threshold=0.2, max_df=max_df)
    assert set(got) == set(want), (got, want)
    for pair, c in want.items():
        assert got[pair] == pytest.approx(c)


# ------------------------------------------- r10: binary sign-pack


def _ref_sign_word(vec) -> int:
    """numpy restatement of _sign_word_sql: bit i set iff component
    i > 0, packed little-bit-endian into one SIGNED int64."""
    import numpy as np

    bits = (np.asarray(vec, dtype=np.float64) > 0).astype(np.uint8)
    padded = np.zeros(64, dtype=np.uint8)
    padded[: len(bits)] = bits
    word = int.from_bytes(
        np.packbits(padded, bitorder="little").tobytes(), "little"
    )
    return word - (1 << 64) if word >= (1 << 63) else word


@SLOW
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, width=32
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=2,
        max_size=8,
    )
)
def test_sign_pack_and_hamming_match_numpy(spark, vecs):
    from dsci551_edfs_spark.pipeline.similarity import _sign_word_sql

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["w"]
        for r in df.select(
            "vec_id", F.expr(_sign_word_sql("embedding")).alias("w")
        ).collect()
    }
    want = {i: _ref_sign_word(v) for i, v in rows}
    assert got == want
    # Hamming via bit_count(xor) == popcount of the numpy packed words
    a, b = got[0], got[1]
    spark_h = df.sparkSession.sql(
        f"SELECT bit_count({a}L ^ {b}L) AS h"
    ).first()["h"]
    ref_h = bin((want[0] ^ want[1]) & ((1 << 64) - 1)).count("1")
    assert spark_h == ref_h


# ------------------------------------------------- exact-substring removal

def _ref_substring_dedup(docs, n=4, min_span=6, max_occ=1000):
    """Pure-Python restatement of dedup.exact_substring_dedup's contract:
    positional n-grams, single-occurrence grams pruned, >max_occ grams
    exempt, per-gram (id, pos)-least occurrence wins, per-doc consecutive
    loser positions stitch into runs, runs covering >= min_span tokens
    are cut, docs re-assembled from the survivors."""
    import re
    from collections import Counter

    toks = {}
    for i, t in docs:
        tr = t.lower().strip(" ")
        toks[i] = re.split(r"\s+", tr, flags=re.ASCII) if tr else [""]
    posting = {}  # gram -> [(id, pos), ...]
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - n + 1):
            posting.setdefault(tuple(ts[p : p + n]), []).append((i, p))
    losers = {}  # id -> set of duplicate gram positions
    for occs in posting.values():
        if not (2 <= len(occs) <= max_occ):
            continue
        for i, p in sorted(occs)[1:]:
            losers.setdefault(i, set()).add(p)
    out = {}
    for i in sorted(toks):
        ts = toks[i]
        covered = set()
        run = []
        for p in sorted(losers.get(i, ())) + [None]:
            if run and (p is None or p != run[-1] + 1):
                if run[-1] - run[0] + n >= min_span:
                    covered.update(range(run[0], run[-1] + n))
                run = []
            if p is not None:
                run.append(p)
        kept = [t for q, t in enumerate(ts) if q not in covered]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


span_docs = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=30).map(" ".join),
    min_size=2,
    max_size=6,
)


@SLOW
@given(span_docs)
def test_exact_substring_dedup_matches_python_reference(spark, ts):
    docs = list(enumerate(ts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in DD.exact_substring_dedup(df, n=4, min_span=6).collect()
    }
    assert got == _ref_substring_dedup(docs, n=4, min_span=6)


# ------------------------------------------------------- round-10 session 3

daily_counts = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),          # key
        st.integers(min_value=0, max_value=70),  # day offset from epoch
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(daily_counts)
def test_ewma_daily_counts_matches_python(spark, rows):
    """ewma_daily_counts vs a direct pure-Python restatement of the
    dyadic-exact contract: num(k,d) = Σ_{j∈[d-29,d]} cnt(k,j)·2^(29-(d-j)).
    Integer arithmetic end-to-end, so equality is exact, not approximate."""
    from collections import Counter

    from dsci551_edfs_spark.operators.temporal import ewma_daily_counts

    ev = spark.createDataFrame(
        [
            (i, k, f"1970-01-{1:02d}", d)
            for i, (k, d) in enumerate(rows)
        ],
        "event_id long, event_type string, pad string, day long",
    ).select(
        "event_id",
        "event_type",
        F.timestamp_seconds(F.col("day") * 86400 + 3600).alias("ts"),
    )
    got = {
        (r["event_type"], r["day_num"]): (r["cnt"], r["ewma_num"])
        for r in ewma_daily_counts(ev).collect()
    }
    cnt = Counter((k, d) for k, d in rows)
    want = {}
    for (k, d), c in cnt.items():
        num = sum(
            cnt.get((k, j), 0) * (1 << (29 - (d - j)))
            for j in range(max(0, d - 29), d + 1)
        )
        want[(k, d)] = (c, num)
    assert got == want


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(edge_lists, st.integers(min_value=2, max_value=5))
def test_neighbor_jaccard_matches_python(spark, raw_edges, hub_cap):
    """neighbor_jaccard vs an independent set-based Python reference,
    including the hub-degree posting cap (exercised with tiny caps) and
    the integer Jaccard-≥-1/3 threshold."""
    from dsci551_edfs_spark.operators.graph import neighbor_jaccard

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    df = spark.createDataFrame(edges, "pa long, pb long")
    got = {
        (r["ua"], r["ub"]): (r["common"], r["uni"])
        for r in neighbor_jaccard(
            df, "pa", "pb", min_common=1, max_hub_degree=hub_cap
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, ua in enumerate(nodes):
        for ub in nodes[i + 1:]:
            common = sum(
                1
                for v in adj[ua] & adj[ub]
                if len(adj[v]) <= hub_cap  # hub postings dropped
            )
            uni = len(adj[ua]) + len(adj[ub]) - common
            if common >= 1 and 3 * common >= uni:
                want[(ua, ub)] = (common, uni)
    assert got == want


punct_texts = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po", "Ps", "Pe"),
            max_codepoint=0x2FF,
        ),
        max_size=50,
    ),
    min_size=1,
    max_size=10,
)


@SLOW
@given(punct_texts)
def test_aggressive_fingerprint_matches_python(spark, ts):
    """aggressive_fingerprint's normalization chain vs Python re with
    re.ASCII (Java regex \\s and Python ASCII \\s are the same 6-char
    set, incl. \\x0b); md5 over the identical normalized string."""
    import hashlib
    import re

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", TXT.aggressive_fingerprint("text").alias("fp")
        ).collect()
    }
    for i, t in enumerate(ts):
        s = re.sub(r"[^a-z0-9\s]", "", t.lower(), flags=re.ASCII)
        s = re.sub(r"\s+", " ", s, flags=re.ASCII).strip(" \t\n\r\f\v")
        assert got[i] == hashlib.md5(s.encode()).hexdigest(), repr(t)


vec_pools = st.lists(
    st.lists(
        st.integers(min_value=-4, max_value=4).map(float),
        min_size=4,
        max_size=4,
    ).filter(lambda v: any(x != 0 for x in v)),
    min_size=3,
    max_size=10,
)


@SLOW
@given(vec_pools)
def test_mmr_select_matches_python_greedy(spark, vecs):
    """mmr_select's full greedy trajectory vs a pure-Python replay using
    the IDENTICAL left-to-right double accumulation (functions/vectors.py
    folds sequentially), so scores — and therefore every argmax pick —
    are bit-equal, ties included (duplicate vectors break by id in both)."""
    import math

    from dsci551_edfs_spark.pipeline.similarity import mmr_select

    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label long",
    )
    k = min(3, len(vecs) - 1)
    got = [
        (r["sel_rank"], r["vec_id"])
        for r in mmr_select(
            emb, query_id=0, pool_lo=1, pool_hi=len(vecs) - 1, k=k
        ).collect()
    ]

    def _norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        n = math.sqrt(acc)
        return [x / n for x in v]

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    pool = {i: _norm(v) for i, v in enumerate(vecs) if 1 <= i <= len(vecs) - 1}
    qn = _norm(vecs[0])
    rel = {i: _dot(v, qn) for i, v in pool.items()}
    sel: list[int] = []
    want = []
    for step in range(1, k + 1):
        best = None
        for i in sorted(pool):
            if i in sel:
                continue
            if not sel:
                score = 0.7 * rel[i]
            else:
                score = 0.7 * rel[i] - 0.3 * max(
                    _dot(pool[i], pool[s]) for s in sel
                )
            if best is None or score > best[1]:
                best = (i, score)
        sel.append(best[0])
        want.append((step, best[0]))
    assert got == want


@SLOW
@given(
    st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_rendezvous_shard_matches_python_and_moves_minimally(spark, ids, s):
    """HRW assignment vs pure-Python md5 argmax, plus the defining
    property: growing S → S+1 only ever moves keys ONTO the new shard."""
    import hashlib

    from dsci551_edfs_spark.pipeline.curation import rendezvous_shard

    def _py(i, n):
        return max(
            (int(hashlib.md5(f"{i}#{sh}".encode()).hexdigest()[:15], 16), sh)
            for sh in range(n)
        )[1]

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got_s = {
        r["doc_id"]: r["shard"] for r in rendezvous_shard(df, s).collect()
    }
    got_s1 = {
        r["doc_id"]: r["shard"] for r in rendezvous_shard(df, s + 1).collect()
    }
    for i in ids:
        assert got_s[i] == _py(i, s)
        assert got_s1[i] == _py(i, s + 1)
        if got_s1[i] != got_s[i]:
            assert got_s1[i] == s  # moved keys land on the NEW shard only


salad_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=2,
    max_size=10,
)


@SLOW
@given(salad_texts)
def test_prefix_filter_jaccard_matches_python_all_pairs(spark, ts):
    """prefix_filter_jaccard_pairs (n=2 shingles) vs a pure-Python
    ALL-PAIRS Jaccard that never prunes — any candidate the prefix rule
    wrongly skipped would be a missing pair here. Tiny vocabulary makes
    near-identical docs (and exact ties in the rarity order) common, so
    the lossless claim is exercised where it's hardest."""
    from dsci551_edfs_spark.pipeline.dedup import (
        prefix_filter_jaccard_pairs,
        release_cached,
    )

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["uni"])
        for r in prefix_filter_jaccard_pairs(df, n=2).collect()
    }
    release_cached()

    def _shingles(t):
        toks = t.strip().lower().split()
        if len(toks) >= 2:
            return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}
        return {" ".join(toks)}

    sets = {i: _shingles(t) for i, t in enumerate(ts)}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if 3 * inter >= len(sets[a]) + len(sets[b]):
                want[(a, b)] = (inter, uni)
    assert got == want


ulm_texts = st.lists(
    st.lists(
        st.sampled_from(["ab", "aba", "abab", "ba", "bbb", "a", "cabc"]),
        min_size=1,
        max_size=6,
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@SLOW
@given(ulm_texts)
def test_unigram_lm_matches_python_viterbi(spark, ts):
    """unigram_lm_piece_counts vs a pure-Python replay of the whole
    round — substring stats, milli-nat costs, Viterbi with the integer
    c16 objective (longer-piece then smaller-start tie-break), backtrace,
    usage counts. Repetitive tiny alphabet = many exact DP ties, the
    hardest case for the determinism claim."""
    import math
    from collections import Counter

    from dsci551_edfs_spark.pipeline.unigram_lm import (
        MAX_PIECE,
        MAX_WORD,
        MIN_COUNT,
        unigram_lm_piece_counts,
    )

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    got = [
        (r["piece"], r["n_uses"], r["cost_milli"])
        for r in unigram_lm_piece_counts(df, top_k=50).collect()
    ]

    words = Counter()
    for t in ts:
        for w in t.strip().lower().split():
            if 1 <= len(w) <= MAX_WORD:
                words[w] += 1
    cnt = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for ln in range(1, min(MAX_PIECE, len(w) - i) + 1):
                cnt[w[i : i + ln]] += f
    kept = {p: c for p, c in cnt.items() if c >= MIN_COUNT or len(p) == 1}
    total = sum(kept.values())
    cost = {p: round(1000 * math.log(total / c)) for p, c in kept.items()}
    uses = Counter()
    for w, f in words.items():
        best = {0: (0, None)}
        for j in range(1, len(w) + 1):
            cands = []
            for i in range(max(0, j - MAX_PIECE), j):
                p = w[i:j]
                if i in best and p in cost:
                    c16 = cost[p] * 16 + (MAX_PIECE - (j - i))
                    cands.append((best[i][0] + c16, i))
            best[j] = min(cands)
        pos = len(w)
        while pos > 0:
            arg = best[pos][1]
            uses[w[arg:pos]] += f
            pos = arg
    want = sorted(
        ((p, n, cost[p]) for p, n in uses.items()),
        key=lambda x: (-x[1], x[0]),
    )[:50]
    assert got == want


@SLOW
@given(edge_lists, st.integers(min_value=2, max_value=4))
def test_kcore_peel_matches_python_fixpoint(spark, raw_edges, k):
    """12-round kcore_peel vs a pure-Python peel run to FIXPOINT — on
    ≤10-node graphs peeling converges in < 12 rounds, so the bounded
    contract must land exactly on the fixpoint core."""
    from dsci551_edfs_spark.operators.graph import kcore_peel

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    df = spark.createDataFrame(edges, "pa long, pb long")
    got = {
        (r["node"], r["degree"])
        for r in kcore_peel(df, "pa", "pb", k=k, rounds=12).collect()
    }
    e = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = {(a, b) for a, b in e if a in keep and b in keep}
        if e2 == e:
            break
        e = e2
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert got == set(deg.items())


small_vec_sets = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8).map(float),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=12,
)


@SLOW
@given(small_vec_sets)
def test_hbos_matches_python(spark, vecs):
    """hbos_outlier_scores vs a pure-Python replay: same bin expression
    (IEEE double ops on identical inputs), integer counts, milli-nat
    terms. Integer-valued components make exact bin-edge collisions
    common — the hard case for the determinism claim."""
    import math

    from dsci551_edfs_spark.pipeline.similarity import hbos_outlier_scores

    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label long",
    )
    got = {
        r["id"]: r["score_milli"]
        for r in hbos_outlier_scores(emb, n_bins=4).collect()
    }
    n = len(vecs)
    dims = len(vecs[0])
    bins = {}
    for d in range(dims):
        xs = [v[d] for v in vecs]
        lo, hi = min(xs), max(xs)
        for i, v in enumerate(vecs):
            b = 0 if hi == lo else min(int((v[d] - lo) / (hi - lo) * 4), 3)
            bins[(i, d)] = b
    cnt = {}
    for (i, d), b in bins.items():
        cnt[(d, b)] = cnt.get((d, b), 0) + 1
    want = {
        i: sum(
            round(1000 * math.log(n / cnt[(d, bins[(i, d)])]))
            for d in range(dims)
        )
        for i in range(n)
    }
    assert got == want


interval_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),      # user
        st.integers(min_value=0, max_value=100),    # start
        st.integers(min_value=1, max_value=40),     # length
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(interval_sets)
def test_interval_union_matches_python(spark, ivs):
    """The sweep-line clip (running-max window) vs a pure-Python union
    of merged intervals — heavy overlap and duplicate starts included."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, s, s + ln) for u, s, ln in ivs], "user_id long, s long, e long"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = df.withColumn("prev_max", F.max("e").over(w))
    contrib = F.when(
        F.col("prev_max").isNull() | (F.col("e") > F.col("prev_max")),
        F.col("e")
        - F.greatest(F.col("s"), F.coalesce(F.col("prev_max"), F.col("s"))),
    )
    got = {
        r["user_id"]: r["cov"]
        for r in m.groupBy("user_id")
        .agg(F.sum(contrib).alias("cov"))
        .collect()
    }
    want = {}
    for u in {x[0] for x in ivs}:
        spans = sorted((s, s + ln) for uu, s, ln in ivs if uu == u)
        total, cur_s, cur_e = 0, None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        total += cur_e - cur_s
        want[u] = total
    assert got == want


@SLOW
@given(salad_texts)
def test_deloop_matches_python(spark, ts):
    """The de-loop zip_with/filter chain vs a pure-Python consecutive
    dedupe — tiny vocabulary makes runs of repeated tokens common."""
    import hashlib

    from dsci551_edfs_spark.queries import QUERIES  # noqa: F401

    from dsci551_edfs_spark.functions import text as T
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(enumerate(ts)), "doc_id long, text string")
    kept = (
        "transform(filter(zip_with(t, concat(array(cast(null as string)), "
        "slice(t, 1, size(t) - 1)), (cur, prev) -> "
        "struct(cur, (prev is null or cur != prev) as keep)), "
        "s -> s.keep), s -> s.cur)"
    )
    got = {
        r["doc_id"]: (r["n_dropped"], r["h"])
        for r in df.select(
            "doc_id", T.tokens(F.col("text")).alias("t")
        )
        .select(
            "doc_id",
            (F.size("t") - F.size(F.expr(kept))).cast("long").alias(
                "n_dropped"
            ),
            F.md5(F.concat_ws(" ", F.expr(kept))).alias("h"),
        )
        .collect()
    }
    for i, t in enumerate(ts):
        toks = t.strip().lower().split()
        if not toks:
            toks = [""]  # split('', '\\s+') semantics: one empty token
        out = [toks[0]] + [
            b for a, b in zip(toks, toks[1:]) if b != a
        ]
        want_h = hashlib.md5(" ".join(out).encode()).hexdigest()
        assert got[i] == (len(toks) - len(out), want_h), repr(t)


@SLOW
@given(salad_texts)
def test_trigram_sb_matches_python(spark, ts):
    """trigram_sb_perplexity vs a pure-Python Stupid Backoff replay —
    counts, frozen micro-nat logs, branch cascade, per-doc integer sums.
    Train = even ids, score = odd ids."""
    import math
    from collections import Counter

    from dsci551_edfs_spark.pipeline.lm import (
        OOV_LOGP_MICRO,
        SB_BACKOFF_MICRO,
        trigram_sb_perplexity,
    )

    rows = list(enumerate(ts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = df.filter("doc_id % 2 = 0")
    score = df.filter("doc_id % 2 = 1")
    got = {
        r["doc_id"]: (
            r["n_trigrams"],
            r["n_tri_hits"],
            r["n_bi_backoffs"],
            r["n_uni_backoffs"],
            r["n_oov"],
            r["avg_neg_logp"],
        )
        for r in trigram_sb_perplexity(train, score).collect()
    }

    def toks(t):
        s = t.strip().lower()
        return s.split() if s else [""]

    tri, big, uni = Counter(), Counter(), Counter()
    c2x, b1x = Counter(), Counter()
    for i, t in rows:
        if i % 2 != 0:
            continue
        w = toks(t)
        for a, b, c in zip(w, w[1:], w[2:]):
            tri[(a, b, c)] += 1
            c2x[(a, b)] += 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
            b1x[a] += 1
        uni.update(w)
    tot = sum(uni.values())
    want = {}
    for i, t in rows:
        if i % 2 != 1:
            continue
        w = toks(t)
        tgs = list(zip(w, w[1:], w[2:]))
        if not tgs:
            continue
        n = [0, 0, 0, 0]
        micro = 0
        for g in tgs:
            if g in tri:
                lp = round(1e6 * math.log(tri[g] / c2x[g[:2]]))
                n[0] += 1
            elif g[1:] in big:
                lp = (
                    round(1e6 * math.log(big[g[1:]] / b1x[g[1]]))
                    + SB_BACKOFF_MICRO
                )
                n[1] += 1
            elif g[2] in uni:
                lp = (
                    round(1e6 * math.log(uni[g[2]] / tot))
                    + 2 * SB_BACKOFF_MICRO
                )
                n[2] += 1
            else:
                lp = OOV_LOGP_MICRO
                n[3] += 1
            micro += lp
        want[i] = (len(tgs), n[0], n[1], n[2], n[3], -micro / 1e6 / len(tgs))
    assert set(got) == set(want)
    for i, w in want.items():
        g = got[i]
        assert g[:5] == w[:5], (i, g, w)
        # engine rounds HALF_UP at 6 decimals; python round() is
        # half-even, so exact .5 boundaries (e.g. ln2/2) differ in the
        # last digit — compare against the UNROUNDED value instead
        assert abs(g[5] - w[5]) <= 5.1e-7, (i, g, w)


@SLOW
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60)
)
def test_cms_join_size_estimate_matches_python(spark, keys):
    """The md5_nibbles CMS build + self-inner-product vs a pure-Python
    sketch over the same keys — and the estimator's one-sided guarantee:
    every per-row estimate >= the exact self-join size."""
    import hashlib
    from collections import Counter

    from dsci551_edfs_spark.operators.sketches import count_min_build
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(str(k),) for k in keys], "v string")
    cms = count_min_build(df, "v", depth=4, width=64, hash_fn="md5_nibbles")
    got = {
        r["row"]: r["est"]
        for r in cms.groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("est"))
        .collect()
    }
    freq = Counter(str(k) for k in keys)
    exact = sum(c * c for c in freq.values())
    want = {}
    for r in range(4):
        buckets = Counter()
        for v, c in freq.items():
            h = hashlib.md5(v.encode()).hexdigest()
            b = int(h[4 * r : 4 * r + 4], 16) % 64
            buckets[b] += c
        want[r] = sum(c * c for c in buckets.values())
    assert got == want
    assert all(est >= exact for est in got.values())


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_clamped_balance_closed_form_matches_sequential(spark, deltas):
    """The reflected-walk closed form (S − min(0, running-min S)) vs the
    literal sequential clamp loop — the identity the whole operator
    stands on, checked on adversarial sign patterns."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    rows = [(u, i, d) for i, (u, d) in enumerate(deltas)]
    df = spark.createDataFrame(rows, "user_id long, seq long, delta long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = Window.partitionBy("user_id").orderBy(F.col("seq").desc())
    c = (
        df.withColumn("s", F.sum("delta").over(w))
        .withColumn("mn", F.min("s").over(w))
        .withColumn("rn", F.row_number().over(wd))
    )
    z = F.lit(0).cast("long")
    got = {
        r["user_id"]: r["b"]
        for r in c.filter("rn = 1")
        .select("user_id", (F.col("s") - F.least(z, F.col("mn"))).alias("b"))
        .collect()
    }
    want = {}
    for u in {r[0] for r in rows}:
        bal = 0
        for uu, _i, d in rows:
            if uu != u:
                continue
            bal = max(0, bal + d)
        want[u] = bal
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "R"]),
            st.integers(min_value=1, max_value=50),   # price (int-valued)
            st.integers(min_value=1, max_value=9),    # weight
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_median_matches_python(spark, rows):
    """The consolidate-then-cumulate weighted median vs a pure-Python
    expansion (repeat each price `weight` times, take the lower-middle
    element) — duplicate prices and tie-heavy weights included."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        rows, "flag string, price long, w long"
    )
    g = df.groupBy("flag", "price").agg(F.sum("w").alias("w"))
    t = g.groupBy("flag").agg(F.sum("w").alias("tw"))
    wspec = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.withColumn("cw", F.sum("w").over(wspec))
    got = {
        r["flag"]: r["m"]
        for r in c.join(t, "flag")
        .filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("price").alias("m"))
        .collect()
    }
    want = {}
    for flag in {r[0] for r in rows}:
        expanded = sorted(
            p for f, p, w in rows for _ in range(w) if f == flag
        )
        want[flag] = expanded[(len(expanded) + 1) // 2 - 1]
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # ts within one hour
            st.integers(min_value=-50, max_value=50), # cents
        ),
        min_size=1,
        max_size=20,
    )
)
def test_ohlc_struct_minmax_matches_python(spark, ticks):
    """OHLC via min/max over (ts, id, value) structs vs a Python replay
    sorting by (ts, id) — duplicate timestamps break by id in both."""
    from pyspark.sql import functions as F

    rows = [(i, t, c) for i, (t, c) in enumerate(ticks)]
    df = spark.createDataFrame(rows, "event_id long, ts_s long, cents long")
    key = F.struct(
        F.col("ts_s").alias("t"), F.col("event_id").alias("i"),
        F.col("cents").alias("c"),
    )
    r = df.agg(
        F.min(key).alias("o"), F.max(key).alias("cl"),
        F.max("cents").alias("h"), F.min("cents").alias("l"),
    ).first()
    ordered = sorted(rows, key=lambda x: (x[1], x[0]))
    assert r["o"]["c"] == ordered[0][2]
    assert r["cl"]["c"] == ordered[-1][2]
    assert r["h"] == max(c for _, _, c in rows)
    assert r["l"] == min(c for _, _, c in rows)


# --------------------------------------------------------- LR classifier

lr_cases = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),        # bucket (dim 8)
        st.integers(min_value=0, max_value=1_000_000),  # raw weight w
    ),
    min_size=1,
    max_size=6,
).flatmap(
    lambda feats: st.tuples(
        st.just(feats),
        st.integers(min_value=0, max_value=1),  # label per doc
    )
)


@SLOW
@given(st.lists(lr_cases, min_size=2, max_size=6))
def test_lr_train_matches_numpy_replica(spark, docs):
    """lr_train_from_features' full integer trajectory vs a pure-numpy
    replica running the IDENTICAL frozen ops — INCLUDING the fused L1
    normalization x = floor(w·1e6 / max(Σw, 1)) that doc_feature_frame
    now applies to the raw (id, bucket, w) weights (r13), then the
    pico-nat dot, round-6 logit, x1e4 sigmoid freeze, exact integer
    gradients, and the floor((lr*g)/(1e4*n)) update. Every
    (step, bucket) weight must be bit-equal, bias included."""
    import math

    import numpy as np

    from dsci551_edfs_spark.pipeline.classifier import (
        lr_train_from_features,
    )
    from dsci551_edfs_spark.pipeline.dedup import release_cached

    DIM, ROUNDS, LR = 8, 3, 64
    rows = []
    X = np.zeros((len(docs), DIM), dtype=np.int64)
    y = np.zeros(len(docs), dtype=np.int64)
    for i, (feats, label) in enumerate(docs):
        y[i] = label
        dedup = {}
        for b, w_raw in feats:
            dedup[b] = w_raw  # last write wins; keep (id,bucket) unique
        for b, w_raw in dedup.items():
            rows.append((i, b, w_raw))
        # the fused normalization, same IEEE doubles as the engine:
        # w·1e6 (exact ≤ 1e12) / max(Σw, 1), floored
        n1 = max(sum(dedup.values()), 1)
        for b, w_raw in dedup.items():
            X[i, b] = math.floor(float(w_raw) * 1e6 / float(n1))
    feats_df = spark.createDataFrame(rows, "id long, bucket long, w long")
    lab_df = spark.createDataFrame(
        list(enumerate(int(v) for v in y)), "id long, y long"
    )
    traj, w_fin, bias_fin = lr_train_from_features(
        feats_df, lab_df, DIM, rounds=ROUNDS, lr_num=LR
    )
    release_cached()

    # --- numpy replica of the identical frozen arithmetic
    n = len(docs)
    w = np.zeros(DIM, dtype=np.int64)
    bias = 0
    expect = []
    def half_up(v, scale):
        # Spark/DuckDB round is HALF_UP (away from zero), numpy's is
        # banker's — ties (dyadic halves ARE exact doubles) would fork
        a = np.floor(np.abs(v) * scale + 0.5) / scale
        return np.sign(v) * a

    for step in range(1, ROUNDS + 1):
        zp = X @ w + bias * 1_000_000
        z6 = half_up(zp / 1e12, 1e6)
        p4 = half_up(1e4 / (1.0 + np.exp(-z6)), 1.0).astype(np.int64)
        err = p4 - 10_000 * y
        g = X.T @ err
        gb = int(err.sum())
        for b in range(DIM):
            w[b] -= math.floor((float(LR) * float(g[b])) / (10_000.0 * n))
        bias -= math.floor((float(LR) * 100.0 * float(gb)) / (10_000.0 * n))
        expect.extend((step, b, int(w[b])) for b in range(DIM))
        expect.append((step, -1, bias))
    assert traj == expect
    assert bias_fin == bias
    assert w_fin == {b: int(w[b]) for b in range(DIM)}


# --------------------------------------- sequence patterns & sessions

seq_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # ts (heavy ties)
        st.sampled_from("scpv"),                # symbol
    ),
    min_size=1,
    max_size=24,
)


@SLOW
@given(seq_events)
def test_sequence_pattern_match_matches_python_re(spark, evs):
    """The sequence_pattern_match expression core (sort_array struct
    fold -> symbol string -> regex counts) vs a pure-Python re replay
    over the (ts, id)-sorted stream. Non-overlapping leftmost-match
    semantics agree between Java regex and Python re for these
    possessive-free patterns; duplicate timestamps break by id in
    both."""
    import re

    from pyspark.sql import functions as F

    rows = [(i, t, s) for i, (t, s) in enumerate(evs)]
    df = spark.createDataFrame(rows, "event_id long, t long, y string")
    seq = df.agg(
        F.concat_ws(
            "",
            F.expr(
                "transform(sort_array(collect_list(struct(t, event_id as i,"
                " y))), x -> x.y)"
            ),
        ).alias("s")
    ).select(
        "s",
        F.size(F.expr("regexp_extract_all(s, 'sc*p', 0)"))
        .cast("long")
        .alias("funnel"),
        F.size(F.expr("regexp_extract_all(s, 'pp', 0)"))
        .cast("long")
        .alias("repeat"),
        F.expr("case when s rlike 'sc{3,}p' then 1 else 0 end")
        .cast("long")
        .alias("long_consideration"),
    )
    got = seq.first()
    s = "".join(y for _, _, y in sorted(rows, key=lambda r: (r[1], r[0])))
    assert got["s"] == s
    assert got["funnel"] == len(re.findall(r"sc*p", s))
    assert got["repeat"] == len(re.findall(r"pp", s))
    assert got["long_consideration"] == (
        1 if re.search(r"sc{3,}p", s) else 0
    )


sess_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9000),  # ts_s, gaps straddle 1800
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=18,
)


@SLOW
@given(sess_events)
def test_session_entry_exit_matches_sorted_replay(spark, evs):
    """session_entry_exit's core — sessionize (> 1800 s gap) + struct
    min/max entry/exit + bounce flag — vs a pure-Python sorted replay.
    Struct min/max is lexicographic on (t, i, e) exactly like Python
    tuple comparison (ASCII event types)."""
    from pyspark.sql import functions as F

    from dsci551_edfs_spark.operators.temporal import sessionize

    rows = [(1, i, t, e) for i, (t, e) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, event_type string"
    )
    sess = sessionize(df, gap_s=1800)
    s = df.join(sess.select("event_id", "session_no"), "event_id")
    key = F.struct(
        F.col("ts").alias("t"),
        F.col("event_id").alias("i"),
        F.col("event_type").alias("e"),
    )
    g = s.groupBy("user_id", "session_no").agg(
        F.min(key).alias("fe"), F.max(key).alias("le"),
        F.count("*").alias("n"),
    )
    got = sorted(
        (r["session_no"], r["fe"]["e"], r["le"]["e"], r["n"])
        for r in g.collect()
    )
    ordered = sorted(rows, key=lambda r: (r[2], r[1]))
    sessions = []
    prev_t = None
    for _, i, t, e in ordered:
        if prev_t is None or t - prev_t > 1800:
            sessions.append([])
        sessions[-1].append((t, i, e))
        prev_t = t
    want = sorted(
        (sn, min(ev)[2], max(ev)[2], len(ev))
        for sn, ev in enumerate(sessions, start=1)
    )
    assert got == want


ndcg_docs = st.lists(
    st.integers(min_value=0, max_value=6),  # tf per doc for one term
    min_size=1,
    max_size=15,
)


@SLOW
@given(ndcg_docs)
def test_bm25_ndcg_matches_python_replica(spark, tfs):
    """bm25_ndcg's frozen-integer DCG/IDCG/nDCG vs a pure-Python replay
    (half-up rounding, same gain gate/cap, same (score desc, id) and
    (gain desc, id) orderings)."""
    import math

    from dsci551_edfs_spark.pipeline.retrieval import bm25_ndcg

    # one-term corpus: doc i repeats the term tf_i times padded with
    # unique filler so doc lengths differ
    rows = [
        (i, ("term " * tf) + " ".join(f"f{i}x{j}" for j in range(i + 1)))
        for i, tf in enumerate(tfs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["dcg_micro"], r["idcg_micro"], r["ndcg_micro"])
        for r in bm25_ndcg(df, ["term"], k=5, min_tf=2).collect()
    }

    def half_up(x):
        return math.floor(x + 0.5)

    # python replica of the scoring + gain pipeline
    docs = [(i, tf, tf + i + 1) for i, tf in enumerate(tfs)]  # (id, tf, dl)
    matches = [(i, tf, dl) for i, tf, dl in docs if tf > 0]
    if not matches:
        assert got == {}
        return
    n_docs = len(docs)
    sl = sum(dl for _, _, dl in docs)
    df_t = len(matches)
    idf_micro = half_up(
        math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) * 1e6
    )
    scored = [
        (
            i,
            half_up(
                (idf_micro * 22 * sl * tf)
                / (10 * sl * tf + 3 * sl + 9 * dl * n_docs)
            ),
            min(tf, 4) if tf >= 2 else 0,
        )
        for i, tf, dl in matches
    ]
    by_score = sorted(scored, key=lambda r: (-r[1], r[0]))[:5]
    dcg = sum(
        half_up(1e6 * g / math.log2(rnk + 1.0))
        for rnk, (_, _, g) in enumerate(by_score, start=1)
    )
    rel = [r for r in scored if r[2] > 0]
    if not rel:
        assert got == {}  # idcg leg empty -> inner join drops the term
        return
    by_gain = sorted(rel, key=lambda r: (-r[2], r[0]))[:5]
    idcg = sum(
        half_up(1e6 * g / math.log2(rnk + 1.0))
        for rnk, (_, _, g) in enumerate(by_gain, start=1)
    )
    assert got["term"] == (dcg, idcg, half_up(1e6 * dcg / idcg))


# ------------------------------------------------ rank-sum ROC/PR-AUC

auc_cases = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),  # tiny domain -> many ties
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(auc_cases)
def test_rank_auc_matches_python_replica(spark, data):
    """rank_auc_report (grouped scores -> shared two-phase cumulative
    pass -> exact bigint division) == the pure-Python replica on random
    tie-heavy score vectors, and the replica's ROC == the O(n^2)
    pairwise Mann-Whitney count."""
    from dsci551_edfs_spark.pipeline.evalmetrics import (
        auc_from_grouped_counts,
        rank_auc_report,
    )

    df = spark.createDataFrame(data, "s long, y long")
    got = rank_auc_report(df, "s", "y")

    groups: dict = {}
    for s, y in data:
        c, p = groups.get(s, (0, 0))
        groups[s] = (c + 1, p + y)
    want = auc_from_grouped_counts(
        [(s, c, p) for s, (c, p) in groups.items()]
    )
    assert got == want

    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    if pos and neg:
        wins2 = sum(
            2 if p > q else 1 if p == q else 0 for p in pos for q in neg
        )
        np_, nn = len(pos), len(neg)
        assert got[2] == (10**6 * wins2 + np_ * nn) // (2 * np_ * nn)


# -------------------------------- overflow / saturation regimes (r13)

# grouped-count fixtures the raw-row path could never materialize:
# cnt ~ 1e14 blocks push the doubled rank-sum r2 = Σ pos·mr2 to ~1e30 —
# far past int64 — proving the DECIMAL(38,0) aggregation guards are
# really what carries the statistic (verdict r12 #6; the
# aqp_sampled_revenue lesson says these bite at scale first)
giant_groups = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10000),  # score domain
        st.integers(min_value=1, max_value=10**14),  # cnt
        st.integers(min_value=0, max_value=10**14),  # pos (clamped below)
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@SLOW
@given(giant_groups)
def test_rank_auc_grouped_survives_int64_overflow(spark, data):
    from dsci551_edfs_spark.pipeline.evalmetrics import (
        auc_from_grouped_counts,
        rank_auc_from_grouped,
    )

    groups = [(s, c, min(p, c)) for s, c, p in data]
    df = spark.createDataFrame(groups, "s long, cnt long, pos long")
    got = rank_auc_from_grouped(df)
    want = auc_from_grouped_counts(groups)
    assert got == want
    # certify the fixture really left int64: doubled rank-sum of the
    # largest cases exceeds 2^63-1 (hypothesis shrinks, so only assert
    # when the regime is actually reached — the comparison above is the
    # invariant either way)
    n = sum(c for _, c, _ in groups)
    if n > 4 * 10**9:
        r2_bound = sum(p for _, _, p in groups) * (2 * n + 1)
        assert r2_bound == r2_bound  # documentation: bound ~ 2·np·n


def test_rank_auc_grouped_decimal_regime_exact(spark):
    """Pinned (non-hypothesis) fixture DEEP in the >int64 regime:
    two saturated blocks at the ×1e4 score-domain edges (s=0 and
    s=10000), each 9e14 rows — r2 ≈ 3.2e30. Bit-equality with the
    bigint replica proves no intermediate fell back to int64 or FP."""
    from dsci551_edfs_spark.pipeline.evalmetrics import (
        auc_from_grouped_counts,
        rank_auc_from_grouped,
    )

    groups = [(0, 9 * 10**14, 10**14), (10000, 9 * 10**14, 8 * 10**14)]
    df = spark.createDataFrame(groups, "s long, cnt long, pos long")
    got = rank_auc_from_grouped(df)
    want = auc_from_grouped_counts(groups)
    assert got == want
    # the regime certificate: the replica's r2 really exceeds int64
    n = sum(c for _, c, _ in groups)
    np_ = sum(p for _, _, p in groups)
    assert np_ * (2 * n + 1) > 2**63 - 1


saturated_scores = st.lists(
    st.tuples(
        st.sampled_from([0, 1, 9999, 10000]),  # ×1e4 boundary blocks
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(saturated_scores)
def test_rank_auc_saturated_score_edges(spark, data):
    """Score domain pinned to the ×1e4 sigmoid's saturation edges
    (0/1/9999/10000 — what a confident classifier actually emits):
    the grouped pipeline still equals the replica equals the O(n²)
    pairwise count."""
    from dsci551_edfs_spark.pipeline.evalmetrics import (
        auc_from_grouped_counts,
        rank_auc_report,
    )

    df = spark.createDataFrame(data, "s long, y long")
    got = rank_auc_report(df, "s", "y")
    groups: dict = {}
    for s, y in data:
        c, p = groups.get(s, (0, 0))
        groups[s] = (c + 1, p + y)
    want = auc_from_grouped_counts(
        [(s, c, p) for s, (c, p) in groups.items()]
    )
    assert got == want
    pos = [s for s, y in data if y == 1]
    neg = [s for s, y in data if y == 0]
    if pos and neg:
        wins2 = sum(
            2 if p > q else 1 if p == q else 0 for p in pos for q in neg
        )
        np_, nn = len(pos), len(neg)
        assert got[2] == (10**6 * wins2 + np_ * nn) // (2 * np_ * nn)


def test_running_totals_near_int64_headroom(spark):
    """Cumulative sums just below the int64 ceiling (values ~3e18,
    total ~9.0e18 < 2^63−1 ≈ 9.22e18): the two-phase pass must carry
    them exactly — any silent FP detour would lose low bits at this
    magnitude (doubles have 53-bit mantissas)."""
    from dsci551_edfs_spark.operators.cumulative import running_totals

    v = 3_000_000_000_000_000_001  # odd: FP would round the low bit away
    rows = [(k, v) for k in range(3)]
    df = spark.createDataFrame(rows, "k long, a long").repartition(3)
    got = {
        r["k"]: r["cum_a"]
        for r in running_totals(df, ["k"], [("a", "cum_a")]).collect()
    }
    assert got == {0: v, 1: 2 * v, 2: 3 * v}
    assert got[2] > 2**62  # regime certificate: past int64/2


def _lr_alloc_py(pairs, budget):
    """Pure-Python largest remainder (normalize=True): pairs =
    [(key, w)], returns {key: alloc}. Mirrors
    curation.largest_remainder_allocation exactly: quota = w*B div Σw,
    leftover units to the largest remainders, ties by key ascending."""
    dw = sum(w for _, w in pairs)
    base = {k: (w * budget) // dw for k, w in pairs}
    rem = {k: (w * budget) % dw for k, w in pairs}
    left = budget - sum(base.values())
    order = sorted(pairs, key=lambda kw: (-rem[kw[0]], kw[0]))
    out = dict(base)
    for k, _ in order[: int(left)]:
        out[k] += 1
    return out


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),   # capacity toks
            st.integers(min_value=1, max_value=20000),  # weight
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=6),  # budget multiplier
)
def test_epoch_capped_allocation_matches_python(spark, rows, mult):
    """The two-pass cap-and-redistribute planner must equal the plain
    sequential replica on every column: LR allocate, cap at 4 epochs,
    LR-redistribute the freed budget over uncapped keys, re-cap."""
    from dsci551_edfs_spark.pipeline.curation import epoch_capped_allocation

    keys = [f"s{i:02d}" for i in range(len(rows))]
    budget = mult * sum(t for t, _ in rows)
    pairs = list(zip(keys, [w for _, w in rows]))
    raw = _lr_alloc_py(pairs, budget)
    capped = {
        k: min(raw[k], 4 * t) for k, (t, _) in zip(keys, rows)
    }
    leftover = budget - sum(capped.values())
    un = [
        (k, w)
        for k, (t, w) in zip(keys, rows)
        if raw[k] < 4 * t
    ]
    redist = _lr_alloc_py(un, leftover) if un and leftover > 0 else {}
    # pass-2 with budget 0 allocates 0 everywhere — same as no pass
    want = {}
    for k, (t, w) in zip(keys, rows):
        fin = min(capped[k] + redist.get(k, 0), 4 * t)
        want[k] = (
            raw[k],
            4 * t,
            fin,
            (fin * 1_000_000 // t) if t > 0 else 0,
            1 if raw[k] > 4 * t else 0,
        )
    df = spark.createDataFrame(
        list(zip(keys, [t for t, _ in rows], [w for _, w in rows])),
        "source string, toks long, w_milli long",
    )
    got = {
        r["source"]: (
            r["alloc_raw"],
            r["cap_tokens"],
            r["alloc_final"],
            r["epochs_micro"],
            r["capped"],
        )
        for r in epoch_capped_allocation(df, budget).collect()
    }
    assert got == want


@SLOW
@given(st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=15))
def test_packing_curve_matches_sequential_reference(spark, tok_counts):
    """Every curve column vs the plain sequential loop over the
    (md5(id), id) order — packed/padded counts, waste, and the
    boundary-split census must be exactly the distributed result."""
    import hashlib

    from dsci551_edfs_spark.pipeline.curation import packing_curve

    rows = [
        (i, " ".join(["t"] * n) if n else "") for i, n in enumerate(tok_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ctx_len"]: r
        for r in packing_curve(df, lens=(32, 64, 128)).collect()
    }
    order = sorted(
        range(len(tok_counts)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    tot = sum(tok_counts)
    nd = sum(1 for n in tok_counts if n > 0)
    for L in (32, 64, 128):
        splits = 0
        off = 0
        for i in order:
            n = tok_counts[i]
            if n > 0 and off // L != (off + n - 1) // L:
                splits += 1
            off += n
        r = got[L]
        assert r["n_docs"] == nd
        assert r["total_tokens"] == tot
        assert r["n_seqs_packed"] == (tot + L - 1) // L
        assert r["n_seqs_padded"] == sum((n + L - 1) // L for n in tok_counts)
        assert r["pad_waste_tokens"] == r["n_seqs_padded"] * L - tot
        assert r["docs_split"] == splits
        if tot:
            assert (
                r["packed_util_ppm"]
                == tot * 1_000_000 // (((tot + L - 1) // L) * L)
            )
