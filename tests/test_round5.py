"""Round-5 operator tests: exact-substring span pairs, tokenizer
fertility, char-entropy quality, multi-n decontamination, schema-evolution
union, cross-source prefix-duplication audit, exact per-source percentiles."""

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.pipeline import dedup as DD


# ------------------------------------------------- shared_span_pairs

BASE = "alpha beta gamma delta epsilon zeta eta theta".split()


def test_shared_span_exact_length(spark):
    """Two docs sharing exactly a 7-token run (and nothing else long)
    report longest_span == 7; an unrelated doc pairs with nobody."""
    span = " ".join(BASE[:7])  # 7 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + span + " zz ww"),
            (2, "aa bb cc " + span + " qq"),
            (3, "totally unrelated words nothing here matches at all ok"),
        ],
        "doc_id long, text string",
    )
    rows = DD.shared_span_pairs(docs, n=4, min_span=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["longest_span"]) == (1, 2, 7)


def test_shared_span_min_span_filters(spark):
    """A 5-token shared run is found at min_span=5 but dropped at 6."""
    span = " ".join(BASE[:5])
    docs = spark.createDataFrame(
        [(1, "xx " + span + " yy"), (2, "zz " + span + " ww")],
        "doc_id long, text string",
    )
    assert DD.shared_span_pairs(docs, n=4, min_span=5).count() == 1
    assert DD.shared_span_pairs(docs, n=4, min_span=6).count() == 0


def test_shared_span_two_runs_takes_longest(spark):
    """Two disjoint shared runs (6 and 9 tokens): the pair reports the
    longer one, not the sum."""
    run_a = "a1 a2 a3 a4 a5 a6"
    run_b = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    docs = spark.createDataFrame(
        [
            (1, run_a + " filler1 " + run_b),
            (2, run_b + " other junk " + run_a),
        ],
        "doc_id long, text string",
    )
    rows = DD.shared_span_pairs(docs, n=4, min_span=6).collect()
    assert len(rows) == 1
    assert rows[0]["longest_span"] == 9


def test_shared_span_validates_min_span(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_span"):
        DD.shared_span_pairs(docs, n=4, min_span=3)


def test_shared_span_short_docs_no_crash(spark):
    """Docs shorter than n tokens produce no grams and no pairs."""
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    assert DD.shared_span_pairs(docs, n=4, min_span=4).count() == 0


def test_shared_span_max_occ_caps_boilerplate(spark):
    """A gram occurring in more docs than max_occ is pruned: with the cap
    below the group size the boilerplate span disappears."""
    span = " ".join(BASE)
    docs = spark.createDataFrame(
        [(i, f"u{i} v{i} " + span) for i in range(1, 7)],
        "doc_id long, text string",
    )
    # 6 docs share the run -> 15 pairs uncapped
    assert DD.shared_span_pairs(docs, n=4, min_span=6).count() == 15
    # every shared gram occurs 6 times > max_occ=5 -> all pruned
    assert DD.shared_span_pairs(docs, n=4, min_span=6, max_occ=5).count() == 0


# ------------------------------------------------- registered queries

SF_DIR = "/root/testdata/sf0.001"


def test_char_entropy_flags_degenerate_docs(spark):
    """Single-repeated-char text has entropy 0 (low_entropy); mixed text
    lands higher; empty docs are excluded."""
    from dsci551_edfs_spark.queries import QUERIES

    import tempfile
    import os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "aaaaaaaaaa", "en", "s0", 10),
                (2, "the quick brown fox 123!", "en", "s0", 24),
                (3, "", "en", "s0", 0),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in QUERIES["char_entropy_quality"](spark, d).collect()
        }
    assert set(out) == {1, 2}
    assert out[1]["char_entropy"] == 0.0 and out[1]["low_entropy"]
    assert out[2]["char_entropy"] > 2.0 and not out[2]["low_entropy"]


def test_schema_evolution_union_null_fill(spark):
    """v1 rows carry null schema_rev/n_chars; v2 rows carry null lang —
    and every doc appears exactly once."""
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["schema_evolution_union"](spark, SF_DIR).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    v1 = [r for r in rows if r["doc_id"] % 2 == 0]
    v2 = [r for r in rows if r["doc_id"] % 2 == 1]
    assert v1 and v2
    assert all(r["schema_rev"] is None and r["n_chars"] is None for r in v1)
    assert all(r["lang"] is None and r["schema_rev"] == "v2" for r in v2)
    assert all(r["lang"] is not None for r in v1)


def test_tokenizer_fertility_bounds(spark):
    """Fertility >= 1 (BPE-ish splits never merge words) and byte/char
    ratios are positive and finite on the fixture corpus."""
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["tokenizer_fertility"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["fertility"] >= 1.0
        assert r["chars_per_ws_token"] > 0
        assert r["bytes_per_bpe_token"] > 0


def test_source_length_percentiles_ordering(spark):
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["source_length_percentiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]


def test_cross_source_dup_audit_flags(spark):
    """Same 8-token opening across two sources -> one cross_source group;
    same opening twice within one source -> flagged but not cross_source."""
    from dsci551_edfs_spark.queries import QUERIES

    import tempfile
    import os

    pre = "one two three four five six seven eight"
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, pre + " tail a", "en", "s0", 1),
                (2, pre + " tail b", "en", "s1", 1),
                (3, "nine ten more words here padding out eight tokens x", "en", "s0", 1),
                (4, "nine ten more words here padding out eight tokens y", "en", "s0", 1),
                (5, "a lone document with an opening nobody else shares", "en", "s2", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["cross_source_dup_audit"](spark, d).collect()
    by_keep = {r["keep_id"]: r for r in rows}
    assert set(by_keep) == {1, 3}
    assert by_keep[1]["cross_source"] and by_keep[1]["n_sources"] == 2
    assert not by_keep[3]["cross_source"] and by_keep[3]["n_sources"] == 1


def test_decontam_multi_n_strict_implies_loose(spark):
    """Every strict (5-gram) contamination is also loose (3-gram): a
    5-token verbatim run contains 3-token runs."""
    from dsci551_edfs_spark.queries import QUERIES

    rows = QUERIES["decontam_multi_n"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["contaminated_strict"]:
            assert r["contaminated_loose"]
        assert r["overlap_5"] >= 0 and r["overlap_3"] >= 0


# ------------------------------------------------- media phash + gap fill


def test_media_phash_identical_near_far(spark):
    """Identical payloads hash identically; a LOCALIZED same-length edit
    (the perturbation class dHash is robust to — a global shift breaks
    real dHash too) stays within Hamming 6; unrelated docs don't pair."""
    from dsci551_edfs_spark.pipeline import multimodal as MM
    from dsci551_edfs_spark.pipeline import dedup as DD

    base = ("alpha beta gamma delta epsilon zeta eta theta " * 8).strip()
    # one same-length character substitution mid-document: localized edit
    near = base[:200] + "Q" + base[201:]
    other = ("one two three four five six seven eight nine ten " * 8).strip()
    docs = spark.createDataFrame(
        # doc_id % 3 controls the fake media kind; keep all three the same
        # kind (img) so headers match and only payloads differ
        [(0, base), (3, base), (6, near), (9, other)],
        "doc_id long, text string",
    )
    sigs = {
        r["id"]: r["phash"]
        for r in MM.media_phash(MM.attach_media(docs)).collect()
    }
    assert sigs[0] == sigs[3]  # identical payload -> identical phash

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sigs[0], sigs[6]) <= 6  # small edit stays near
    assert ham(sigs[0], sigs[9]) > 6  # unrelated stays far

    from pyspark.sql import functions as F

    pairs = DD.simhash_pairs(
        MM.media_phash(MM.attach_media(docs)).select(
            "id", F.col("phash").alias("simhash")
        ),
        max_hamming=6,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got and (0, 6) in got and (3, 6) in got
    assert all(9 not in p for p in got)


def test_media_phash_grid_validation(spark):
    from dsci551_edfs_spark.pipeline import multimodal as MM

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="64"):
        MM.media_phash(MM.attach_media(docs), grid=(4, 4))


def test_gap_fill_locf_carries_and_flags(spark):
    """A series with a 2-bucket hole gets the hole synthesized, filled
    with the prior value, and flagged; leading rows are never flagged."""
    import datetime as dt

    from dsci551_edfs_spark.operators.temporal import gap_fill_locf

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def hour(i):
        return t0 + dt.timedelta(hours=i)

    obs = spark.createDataFrame(
        [("a", hour(0), 1.0), ("a", hour(3), 4.0), ("b", hour(1), 9.0)],
        "series_key string, bucket_ts timestamp, value double",
    )
    rows = {
        (r["series_key"], r["bucket_ts"]): r
        for r in gap_fill_locf(obs).collect()
    }
    assert len(rows) == 5  # a: hours 0-3 (4 rows), b: hour 1 only
    a1 = rows[("a", hour(1))]
    a2 = rows[("a", hour(2))]
    a3 = rows[("a", hour(3))]
    assert a1["filled"] and a1["value"] == 1.0
    assert a2["filled"] and a2["value"] == 1.0
    assert not a3["filled"] and a3["value"] == 4.0
    assert not rows[("a", hour(0))]["filled"]
    assert not rows[("b", hour(1))]["filled"]


# ----------------------------------------- rolling / dq / running total


def test_running_total_matches_naive(spark):
    """Two-phase running total == the naive single-window answer, at a
    partition count larger than the row count (offset bookkeeping holds
    with empty range partitions)."""
    from dsci551_edfs_spark.operators.cumulative import running_total

    rows = [(i, (i * 7) % 13 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["running_total"]
        for r in running_total(df, ["k"], "v", rank_partitions=64).collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_bpe_segment_vocab_exact(spark):
    """Greedy merge application is exact and priority-ordered: with
    merges ['ab', 'bc'], 'ab' (rank 0) wins at every applicable site
    before 'bc' is considered, and merged multi-char units stop
    matching the 2-char merge table."""
    from dsci551_edfs_spark.functions.text import bpe_segment_vocab

    vocab = spark.createDataFrame(
        [("abc",), ("babc",), ("bcbc",), ("x",), ("",)], "token string"
    )
    got = {
        r["token"]: (r["pieces"], r["n_pieces"])
        for r in bpe_segment_vocab(vocab, ["ab", "bc"]).collect()
    }
    assert got["abc"] == ("ab·c", 2)       # 'ab' beats 'bc'
    assert got["babc"] == ("b·ab·c", 3)
    assert got["bcbc"] == ("bc·bc", 2)     # 'bc' applies where 'ab' absent
    assert got["x"] == ("x", 1)
    assert got[""] == ("", 0)


def test_bpe_segment_docs_rollup(spark):
    """Doc-level piece counts == Σ tf·pieces(token) against a hand
    computation on a toy corpus written as a parquet 'documents' table."""
    import os
    import tempfile

    from dsci551_edfs_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "aa ab aa", "en", "s", 8), (2, "b aa", "en", "s", 4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            r["doc_id"]: (r["n_tokens"], r["n_pieces"])
            for r in QUERIES["bpe_segment_docs"](spark, d).collect()
        }
    # corpus pairs: 'aa'x3 -> aa:3+ab:1... merge table top20 covers all;
    # 'aa' rank0 (cnt 3), 'ab' rank1 -> both single-piece; 'b' 1 piece
    assert rows[1] == (3, 3)
    assert rows[2] == (2, 2)


def test_triangle_count_known_graphs(spark):
    """K4 (4 triangles) + a disjoint square (0) + a pendant edge = 4,
    robust to duplicate and reversed input edges; string node ids take
    the non-packed struct-key path and agree."""
    from dsci551_edfs_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    noise = [(2, 1), (3, 1), (4, 20)]  # dup reversed + pendant
    df = spark.createDataFrame(k4 + square + noise, "a long, b long")
    assert triangle_count(df).first()["n_triangles"] == 4
    sdf = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in k4 + square + noise],
        "a string, b string",
    )
    assert triangle_count(sdf).first()["n_triangles"] == 4


def test_clustering_coefficient_known(spark):
    """K4 + pendant: wedges = Σ C(deg,2) = 3·C(3,2)+C(4,2)+0 = 15,
    triangles = 4, gcc_ppm = 12e6 div 15 = 800000."""
    from dsci551_edfs_spark.operators.graph import clustering_coefficient

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    row = clustering_coefficient(
        spark.createDataFrame(edges, "a long, b long")
    ).first()
    assert (row["n_wedges"], row["n_triangles"], row["gcc_ppm"]) == (
        15,
        4,
        800000,
    )


def test_label_propagation_exact_trace(spark):
    """Synchronous LPA is deterministic: the result after each round
    equals the hand-computed trace (most-frequent neighbor label, ties
    to the smallest). Two triangles + bridge (3,10): round 1 is
    all-ties (labels distinct), so every node takes its min neighbor;
    round 2 has real majorities — exactly these labels."""
    from dsci551_edfs_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    r1 = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=1).collect()
    }
    assert r1 == {1: 2, 2: 1, 3: 1, 10: 3, 11: 10, 12: 10}
    r2 = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=2).collect()
    }
    assert r2 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 3, 12: 3}


def test_running_max_matches_naive(spark):
    """Two-phase running max == the naive prefix max, with empty range
    partitions in play and a value order deliberately decorrelated from
    the order key (max must come from the offset, not the local frame)."""
    from dsci551_edfs_spark.operators.cumulative import running_max

    rows = [(i, ((i * 31) % 17) * 10) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["running_max"]
        for r in running_max(df, ["k"], "v", rank_partitions=64).collect()
    }
    run, want = None, {}
    for k, v in sorted(rows):
        run = v if run is None or v > run else run
        want[k] = run
    assert got == want


def test_dq_report_counts_planted_violations(spark):
    """Every dq counter fires on a doctored orders/customer pair:
    duplicate key, null FK, orphan FK, non-positive price."""
    import os
    import tempfile

    from dsci551_edfs_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, 10, 5.0),
                (1, 10, 6.0),      # duplicate key
                (2, None, 7.0),    # null custkey
                (3, 99, 8.0),      # orphan custkey
                (4, 10, -1.0),     # non-positive price
            ],
            "o_orderkey long, o_custkey long, o_totalprice double",
        ).write.parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            [(10,)], "c_custkey long"
        ).write.parquet(os.path.join(d, "customer.parquet"))
        r = QUERIES["dq_orders_report"](spark, d).collect()[0]
    assert r["n_rows"] == 5 and r["n_distinct_keys"] == 4
    assert r["dup_key_rows"] == 1
    assert r["null_custkey"] == 1
    # null FK rows also fail the join; orphan counts join-misses (null + 99)
    assert r["orphan_orders"] == 2
    assert r["nonpositive_price"] == 1


def test_rolling_7d_avg_window_math(spark):
    """Hand-checkable series: one event per day, value = day index.
    Trailing-7-day average at day 9 (0-based) = mean(3..9) = 6."""
    import datetime as dt
    import os
    import tempfile

    from dsci551_edfs_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "click", float(i), "{}")
        for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["day"].isoformat(): r
            for r in QUERIES["rolling_7d_avg_by_type"](spark, d).collect()
        }
    last = out[max(out)]  # 2024-01-10
    assert last["n_7d"] == 7
    assert last["avg_7d"] == 6.0
    first = out[min(out)]
    assert first["n_7d"] == 1 and first["avg_7d"] == 0.0


def test_bpe_train_matches_naive_reference(spark):
    """bpe_train_merges (inverted-index incremental recount) must equal a
    NAIVE reference that re-derives every pair count from scratch each
    iteration — same corpus, same (count desc, pair asc) tie-break."""
    from dsci551_edfs_spark.functions.text import bpe_train_merges, tokens as _tk

    texts = [
        "the theme of the thesis", "low lower lowest low",
        "new newer newest news", "the low new thesis",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(df, num_merges=12).orderBy("rank").collect()
    ]

    # naive reference: full recount per iteration
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            if len(w) >= 2:
                words[w] += 1
    syms = {w: tuple(w) for w in words}
    expect = []
    for rank in range(12):
        pc = Counter()
        for w, units in syms.items():
            for a, b in zip(units, units[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, lb), cnt = best
        expect.append((rank, la, lb, la + lb, cnt))
        for w, units in syms.items():
            new, i = [], 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == la and units[i + 1] == lb:
                    new.append(la + lb)
                    i += 2
                else:
                    new.append(units[i])
                    i += 1
            syms[w] = tuple(new)
    assert got == expect
    # train -> apply closes the loop: the learned merges segment a trained
    # word into fewer pieces than characters
    from dsci551_edfs_spark.functions.text import bpe_segment_vocab

    merges = [m for _, _, _, m, _ in got]
    seg = {
        r["token"]: r["n_pieces"]
        for r in bpe_segment_vocab(
            spark.createDataFrame([("lowest",)], "token string"), merges
        ).collect()
    }
    assert seg["lowest"] < len("lowest")


def test_bpe_train_partitioning_invariant(spark, sf_dir):
    from dsci551_edfs_spark.functions.text import bpe_train_merges
    from dsci551_edfs_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = bpe_train_merges(docs.repartition(3), num_merges=8).collect()
    b = bpe_train_merges(docs.repartition(17), num_merges=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
