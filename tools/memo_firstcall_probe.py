"""Round-11 probe (verdict #7): where does the memoized queries'
FIRST-call cost go in a fresh session, even when build_s == 0 (memo
served from disk)? Splits each first call into:

  construct_s — QUERIES[name](spark, sf_dir): Python plan construction,
                including any driver-side memo READ / fingerprint check
  first_s     — first materialization (noop write): JVM analysis +
                codegen compile + the actual probe job
  second_s    — steady-state rerun (the number bench medians report)

Usage: python tools/memo_firstcall_probe.py [query ...]
Defaults to the three worst round-10 offenders. Run in a FRESH process
per query list for honest first-call numbers.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
DEFAULT = ["copurchase_triangles", "edfs_datasource_scan", "ann_topk_pq"]


def main() -> None:
    from dsci551_edfs_spark import get_spark
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("memo-firstcall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/session warm-up so the first probed query doesn't absorb it
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()
        t3 = time.perf_counter()
        release_cached()
        out[name] = {
            "construct_s": round(t1 - t0, 3),
            "first_s": round(t2 - t1, 3),
            "second_s": round(t3 - t2, 3),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
