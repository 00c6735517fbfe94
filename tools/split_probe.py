"""Split each query's cost into DataFrame-construction time (Python +
Catalyst analysis + any driver-side collects the builder runs) vs
noop-sink execution time — locates driver-bound queries (guide §7.3)
vs executor-bound ones. Median of N per phase.

Usage: python tools/split_probe.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]

    from dsci551_edfs_spark import get_spark
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, warm_memos

    spark = get_spark("edfs-split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    warm_memos(spark, SF_DIR)
    release_cached()

    out = {}
    for name in args:
        fn = QUERIES[name]
        build, run = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build.append(t1 - t0)
            run.append(t2 - t1)
        release_cached()
        build.sort()
        run.sort()
        out[name] = {
            "build_s": round(build[len(build) // 2], 3),
            "exec_s": round(run[len(run) // 2], 3),
        }
        print(f"  {name}: build={out[name]['build_s']}s exec={out[name]['exec_s']}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
