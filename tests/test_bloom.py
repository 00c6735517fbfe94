"""Bloom-prefiltered incremental dedup: exactness vs the plain anti-join
path, no false negatives, and a sane false-positive rate."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.pipeline import dedup as DD
from dsci551_edfs_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _member(bits, h1, h2, num_bits, num_hashes):
    a = np.asarray(h1, dtype=np.int64).astype(np.uint64)
    c = np.asarray(h2, dtype=np.int64).astype(np.uint64)
    mask = np.uint64(num_bits - 1)
    res = np.ones(len(a), dtype=bool)
    for i in range(num_hashes):
        idx = (a + np.uint64(i) * c) & mask
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        res &= ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1) == 1
    return res


def test_bloom_no_false_negatives_and_fpr(spark, docs):
    num_bits, num_hashes = 1 << 16, 4
    bits = DD.build_fingerprint_bloom(docs, num_bits=num_bits, num_hashes=num_hashes)
    h1c, h2c = DD._bloom_hashes(DD.fingerprint("text"))
    hashes = docs.select(h1c.alias("h1"), h2c.alias("h2")).toPandas()
    got = _member(bits, hashes["h1"], hashes["h2"], num_bits, num_hashes)
    assert got.all()  # every inserted fingerprint must test positive

    # disjoint probes: random 64-bit pairs; expected FPR for n~50 keys in
    # 65536 bits with 4 hashes is ~(1-e^{-4n/m})^4 ~ 1e-10 — allow slack
    rng = np.random.RandomState(7)
    p1 = rng.randint(-(2**63), 2**63, size=5000)
    p2 = rng.randint(-(2**63), 2**63, size=5000)
    fpr = _member(bits, p1, p2, num_bits, num_hashes).mean()
    assert fpr < 0.01


def test_bloom_incremental_equals_plain(spark, docs):
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    plain = DD.incremental_exact_dedup(incoming, existing)
    bloom = DD.incremental_exact_dedup_bloom(incoming, existing)
    a = sorted(r["doc_id"] for r in plain.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in bloom.select("doc_id").collect())
    assert a == b
    DD.release_cached()


def test_bloom_catches_planted_duplicate(spark, docs):
    # plant an incoming doc whose text already exists in the corpus
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    dup_text = existing.select("text").first()["text"]
    incoming = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10_000_001, 10_000_002],
                      "text": [dup_text, "a genuinely novel string xyzzy"]})
    )
    out = DD.incremental_exact_dedup_bloom(incoming, existing)
    assert [r["doc_id"] for r in out.collect()] == [10_000_002]
    DD.release_cached()
