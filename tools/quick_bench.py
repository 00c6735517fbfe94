"""Quiet median-of-N probe for a SUBSET of bench queries — the
measure/re-measure loop of the optimization round without paying for
the full 190-query suite each iteration. Same methodology as bench.py
(noop sink, memo warm untimed, release_cached between queries,
ambient-stamped window) so numbers are comparable to BENCH_local_*.

Usage: python tools/quick_bench.py [-n REPS] query [query ...]
Prints one JSON line: {"queries": {...}, "spread": {...}, "total": s,
"ambient_cpu_frac": f, "reps": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # ambient helpers  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    names = args

    from dsci551_edfs_spark import get_spark
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, warm_memos

    spark = get_spark("edfs-quick-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    warm_memos(spark, SF_DIR)
    release_cached()

    amb0 = bench._ambient_snapshot()
    t: dict[str, float] = {}
    s: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"quick_bench:{name}")
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        release_cached()
        runs.sort()
        t[name] = round(runs[len(runs) // 2], 3)
        s[name] = round(runs[-1] - runs[0], 3)
        print(f"  {name}: {t[name]}s (spread {s[name]})", flush=True)
    out = {
        "queries": t,
        "spread": s,
        "total": round(sum(t.values()), 3),
        "ambient_cpu_frac": bench._ambient_load(
            amb0, bench._ambient_snapshot()
        )["ambient_cpu_frac"],
        "reps": reps,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
