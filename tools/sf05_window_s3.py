"""Session-3 flagship window at a REAL 5x corpus (tools/make_scaled_corpus.py
output): measure the six new operators at sf0.1 and .scratch/sf0.5 in ONE
session, median-of-3, noop-sink forced, release_cached between runs.

Usage: python tools/sf05_window_s3.py [scaled_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES_UNDER_TEST = [
    "unigram_lm_top_pieces",
    "prefix_filter_jaccard_pairs",
    "hashed_tfidf_knn",
    "hbos_outlier_scores",
    "ewma_event_rate",
    "interval_union_minutes",
]


def main() -> None:
    from dsci551_edfs_spark import get_spark
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf0.5"
    spark = get_spark("sf05-window-s3")
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), (scaled, "sf0.5")):
        for name in QUERIES_UNDER_TEST:
            times, rows = [], None
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                times.append(round(time.perf_counter() - t0, 3))
                rows = df.count()
                release_cached()
            times.sort()
            print(
                json.dumps(
                    {
                        "q": name,
                        "sf": tag,
                        "median_s": times[1],
                        "runs": times,
                        "rows": rows,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
