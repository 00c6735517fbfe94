"""Corpus-curation operators: repetition metrics, deterministic
split/sample/shuffle, sequence packing, PII redaction."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.pipeline import curation as CUR
from dsci551_edfs_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_repetition_stats_crafted(spark):
    d = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in CUR.repetition_stats(d).collect()}
    # "a a a a": bigrams = 3x "a a" -> top frac 1.0; trigrams 2x "a a a" -> dup 0.5
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_trigram_frac"] == 0.5
    # all-distinct text: top bigram 1/3, no dup trigrams
    assert out[2]["top_bigram_frac"] == round(1 / 3, 3)
    assert out[2]["dup_trigram_frac"] == 0.0


def test_deterministic_split_is_stable_and_partitioned(docs):
    a = {r["doc_id"]: r["split"] for r in CUR.deterministic_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in CUR.deterministic_split(docs).collect()}
    assert a == b  # stable across runs (the rand() splits can't do this)
    n = len(a)
    frac_train = sum(v == "train" for v in a.values()) / n
    assert 0.7 < frac_train < 0.9  # md5 buckets ~uniform
    assert set(a.values()) == {"train", "val", "test"}


def test_stratified_sample_subset_and_rates(docs):
    out = CUR.stratified_sample(
        docs, {"src0": 0.8, "src3": 0.2}, default_fraction=0.0
    )
    rows = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in rows}
    assert set(by_src) <= {"src0", "src3"}  # default 0 drops the rest
    assert by_src.get("src0", 0) > by_src.get("src3", 0)
    # subset of the input, deterministic
    assert out.count() == out.intersect(out).count()


def test_batch_padding_bucketing_reduces_waste(docs):
    """Length-bucketed loader order must strictly cut dynamic-padding
    waste vs the shuffled order on the fixture, batches fully account
    for every doc, and padded = waste + real tokens."""
    rep = {r["strategy"]: r for r in CUR.batch_padding_report(docs).collect()}
    lb, sh = rep["length_bucketed"], rep["shuffled"]
    assert lb["waste_tokens"] < sh["waste_tokens"]
    assert lb["n_batches"] == sh["n_batches"]
    total_tokens = sh["padded_tokens"] - sh["waste_tokens"]
    assert lb["padded_tokens"] - lb["waste_tokens"] == total_tokens


def test_global_shuffle_is_permutation_matching_md5_order(docs):
    out = CUR.global_shuffle_order(docs).collect()
    n = len(out)
    assert sorted(r["shuffle_pos"] for r in out) == list(range(1, n + 1))
    # spot-check the contract: pos order == (md5(id), id) order
    expected = sorted(
        (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"])
        for r in out
    )
    got = {r["doc_id"]: r["shuffle_pos"] for r in out}
    for pos, (_, doc_id) in enumerate(expected, start=1):
        assert got[doc_id] == pos


def test_pack_sequences_crafted(spark):
    d = spark.createDataFrame(
        [(i, " ".join(["tok"] * 300)) for i in range(4)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in CUR.pack_sequences(d, target_tokens=512).collect()}
    order = sorted(range(4), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cum = 0
    for doc_id in order:
        assert out[doc_id]["n_tokens"] == 300
        assert out[doc_id]["pack_id"] == cum // 512
        cum += 300


def test_redact_pii(spark):
    d = spark.createDataFrame(
        [(1, "mail bob.smith+x@example.co.uk or call 555-123-4567 now")],
        "doc_id long, text string",
    )
    red = d.select(CUR.redact_pii("text").alias("t")).collect()[0]["t"]
    assert red == "mail [EMAIL] or call [PHONE] now"


def test_shuffle_order_plan_has_no_single_partition_window(docs):
    """The 100 TB property: global rank must NOT collapse to a
    single-partition WindowExec — the bucketed two-phase shape keeps the
    window partitioned by the 256 static md5 ranges."""
    df = CUR.global_shuffle_order(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_upsample_repeat_deterministic_and_exact(spark):
    import hashlib

    d = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = CUR.upsample_repeat(d, 2.3).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in out}
    for i in range(200):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
        assert counts[i] == (3 if b < 30 else 2), (i, b, counts[i])
    # factor < 1 degrades to pure sampling with copy always 0
    frac = CUR.upsample_repeat(d, 0.5)
    assert frac.filter("copy != 0").count() == 0
    assert 0 < frac.count() < 200


def test_boilerplate_removal_crafted(spark):
    footer = "Subscribe  To Our Newsletter"  # case/spacing variants collapse
    d = spark.createDataFrame(
        [
            (1, "unique content one\nsubscribe to our newsletter"),
            (2, "unique content two\n" + footer),
            (3, "unique content three\nSUBSCRIBE TO OUR NEWSLETTER"),
            (4, footer),  # all-boilerplate doc survives with n_kept = 0
            (5, "no boilerplate here at all"),
        ],
        "doc_id long, text string",
    )
    inv = CUR.boilerplate_line_stats(d, min_docs=3).collect()
    assert len(inv) == 1 and inv[0]["ndocs"] == 4

    out = {r["doc_id"]: r for r in CUR.remove_boilerplate_lines(d, min_docs=3).collect()}
    assert len(out) == 5  # every input doc has an output row
    assert out[1]["cleaned_text"] == "unique content one"
    assert out[2]["cleaned_text"] == "unique content two"
    assert out[3]["cleaned_text"] == "unique content three"
    assert out[4]["n_kept"] == 0 and out[4]["cleaned_text"] == ""
    assert out[5]["n_kept"] == 1 and out[5]["cleaned_text"] == d.collect()[4]["text"]
    assert all(r["n_segments"] >= r["n_kept"] for r in out.values())


def test_boilerplate_preserves_line_order(spark):
    common = "shared line"
    d = spark.createDataFrame(
        [
            (1, "alpha\n" + common + "\nbeta\ngamma"),
            (2, common + "\nother doc body"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CUR.remove_boilerplate_lines(d, min_docs=2).collect()}
    assert out[1]["cleaned_text"] == "alpha\nbeta\ngamma"
    assert out[2]["cleaned_text"] == "other doc body"


def test_dedup_paragraphs_keep_first(spark):
    shared = "this exact paragraph repeats across documents"
    d = spark.createDataFrame(
        [
            (1, "alpha\n" + shared + "\nbeta"),
            (2, shared + "\nunique two"),
            (3, "unique three\n" + shared + "\n" + shared),  # in-doc repeat too
            (4, shared),  # nothing survives: later copy of every segment
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CUR.dedup_paragraphs(d).collect()}
    assert len(out) == 4
    # first corpus occurrence is (doc 1, pos 1): doc 1 keeps everything
    assert out[1]["cleaned_text"] == "alpha\n" + shared + "\nbeta"
    assert out[2]["cleaned_text"] == "unique two"
    assert out[3]["cleaned_text"] == "unique three"
    assert out[3]["n_segments"] == 3 and out[3]["n_kept"] == 1
    assert out[4]["n_kept"] == 0 and out[4]["cleaned_text"] == ""


def test_dedup_paragraphs_normalized_match(spark):
    # case/whitespace variants hash identically; the kept spelling is the
    # first occurrence's RAW text, not the normalized form
    d = spark.createDataFrame(
        [
            (1, "Shared  Line"),
            (2, "shared line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CUR.dedup_paragraphs(d).collect()}
    assert out[1]["cleaned_text"] == "Shared  Line"
    assert out[2]["n_kept"] == 0


def test_leakage_safe_split_keeps_near_dups_on_one_side(spark):
    from dsci551_edfs_spark.pipeline.curation import leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),          # near-dup of 1 (high Jaccard)
            (3, base),                    # verbatim dup of 1
            (4, "completely different text about spark shuffle behavior"),
        ]
        # spread ids so md5 buckets differ: without clustering, the
        # family {1,2,3} would straddle split boundaries for SOME id
        # triple; the assertion below is id-independent anyway
        ,
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs).collect()}
    # the whole near-dup family shares one cluster and one side
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"] == 1
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    # singleton clusters to itself
    assert out[4]["cluster_id"] == 4
    assert set(r["split"] for r in out.values()) <= {"train", "val", "test"}


def test_span_corruption_roundtrip_reconstructs_original(spark):
    """Substituting each <extra_id_k> in the input with the k-th target
    span must reconstruct the original token sequence exactly — the
    invariant that makes the corruption a lossless training objective."""
    import re

    from dsci551_edfs_spark.functions.text import tokens as tok_expr
    from dsci551_edfs_spark.pipeline.curation import span_corruption

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r for r in span_corruption(docs).collect()}
    orig = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", tok_expr(F.col("text")).alias("t")
        ).collect()
    }
    sent = re.compile(r"^<extra_id_(\d+)>$")
    masked_total = 0
    for did, row in out.items():
        spans: dict[int, list[str]] = {}
        cur = None
        for t in row["target_text"].split():
            m = sent.match(t)
            if m:
                cur = spans.setdefault(int(m.group(1)), [])
            else:
                assert cur is not None
                cur.append(t)
        assert len(spans) == row["n_spans"]
        rebuilt: list[str] = []
        for t in row["input_text"].split():
            m = sent.match(t)
            if m:
                rebuilt.extend(spans[int(m.group(1))])
                masked_total += len(spans[int(m.group(1))])
            else:
                rebuilt.append(t)
        assert rebuilt == orig[did], did
    # the mask rate should land near 15%
    total = sum(len(t) for t in orig.values())
    assert 0.10 < masked_total / total < 0.20


def test_mlm_mask_contract(spark):
    """MLM corruption invariants: labels recover the original sequence,
    non-selected tokens are untouched, the 80/10/10 split and ~15% rate
    hold corpus-wide, and every random replacement is a vocab token."""
    from dsci551_edfs_spark.functions.text import build_vocab
    from dsci551_edfs_spark.functions.text import tokens as tok_expr
    from dsci551_edfs_spark.pipeline.curation import mlm_mask

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r["doc_id"]: r for r in mlm_mask(docs).collect()}
    orig = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tok_expr(F.col("text")).alias("t")).collect()
    }
    vocab = {r["token"] for r in build_vocab(docs, top_n=200).collect()}
    tot_sel = tot_masked = tot_random = tot_kept = tot = 0
    for did, row in out.items():
        toks_in = row["input_text"].split()
        labels = dict(
            t.split(":", 1) for t in row["target_text"].split() if t
        )
        labels = {int(k): v for k, v in labels.items()}
        o = orig[did]
        assert len(toks_in) == len(o)
        n_mask_seen = 0
        for pos, t in enumerate(toks_in):
            if pos in labels:
                assert labels[pos] == o[pos]  # label = original token
                if t == "[MASK]":
                    n_mask_seen += 1
                else:
                    assert t in vocab or t == o[pos]
            else:
                assert t == o[pos]  # untouched outside the selection
        assert n_mask_seen == row["n_masked"]
        assert len(labels) == row["n_masked"] + row["n_random"] + row["n_kept"]
        tot_sel += len(labels)
        tot_masked += row["n_masked"]
        tot_random += row["n_random"]
        tot_kept += row["n_kept"]
        tot += len(o)
    assert 0.10 < tot_sel / tot < 0.20          # ~15% selection
    assert 0.70 < tot_masked / tot_sel < 0.90   # ~80% [MASK]
    assert 0.05 < tot_random / tot_sel < 0.15   # ~10% random
    assert 0.05 < tot_kept / tot_sel < 0.15     # ~10% kept
