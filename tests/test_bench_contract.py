"""bench.py contract lints — cheap import-level checks that the driver's
evidence pipeline cannot silently rot: every HEADLINE name resolves,
the r1-comparable subset stays frozen (it is the ONLY cross-round
comparable number), and every memoized query maps to a real memo tag."""

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


# the round-1 suite: the first 25 HEADLINE entries, frozen forever —
# reordering or replacing any of them silently breaks the
# value_r1_comparable_25q series every VERDICT compares against BASELINE
R1_SET = [
    "pmr_avg_pruned",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "join_region_revenue",
    "window_topk_orders",
    "topk_orders_global",
    "events_tumbling_window",
    "dedup_exact_groups",
    "minhash_dedup_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "ann_brute_force_topk",
    "text_stats",
    "lang_id",
    "token_frequencies",
    "asof_join_last_purchase",
    "range_join_purchase_hour",
    "events_session_window",
    "stateful_user_stats",
    "multimodal_decode",
    "multimodal_frame_sample",
]


def test_headline_names_resolve():
    bench = _bench()
    from dsci551_edfs_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dupes


def test_r1_comparable_prefix_is_frozen():
    bench = _bench()
    assert bench.HEADLINE[:25] == R1_SET


def test_memoized_queries_resolve():
    from dsci551_edfs_spark.queries import MEMOIZED_QUERIES, QUERIES

    for qname in MEMOIZED_QUERIES:
        assert qname in QUERIES, qname
