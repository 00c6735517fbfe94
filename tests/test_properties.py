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
