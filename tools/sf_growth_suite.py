"""Round-11 evidence run: the FULL bench headline suite at sf0.1 vs the
real-5x scaled corpus (tools/make_scaled_corpus.py — fresh keyspace,
decorrelated content, 5x file counts; NOT in-plan K-inflation), same
median-of-3 methodology as bench.py, memo warm-up untimed at each SF.

Usage: python tools/sf_growth_suite.py [scaled_dir] [out_json]
Writes per-query medians for both SFs + growth ratios; prints the
worst growth entries. Ambient load is stamped per window so a noisy
run can't masquerade as a scale regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # HEADLINE + ambient helpers  # noqa: E402


def run_suite(spark, sf_dir: str) -> tuple[dict, dict, dict]:
    from dsci551_edfs_spark.pipeline.dedup import release_cached
    from dsci551_edfs_spark.queries import QUERIES, warm_memos

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    memo = warm_memos(spark, sf_dir)
    release_cached()
    timings, spreads = {}, {}
    for name in bench.HEADLINE:
        runs = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:  # a 5x-scale failure IS a finding —
            release_cached()      # record it, keep measuring the rest
            timings[name] = None
            spreads[name] = None
            print(f"  {name}: FAILED {type(exc).__name__}: {exc}"[:300], flush=True)
            continue
        release_cached()
        runs.sort()
        timings[name] = round(runs[1], 3)
        spreads[name] = round(runs[2] - runs[0], 3)
        print(f"  {name}: {timings[name]}s", flush=True)
    return timings, spreads, memo


def main() -> None:
    from dsci551_edfs_spark import get_spark

    scaled = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf0.5"
    )
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scratch/SF_GROWTH_r11.json"
    )
    spark = get_spark("sf-growth-suite")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {"scaled_dir": scaled, "windows": {}}
    for tag, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf0.5", scaled)):
        print(f"== {tag} ({sf_dir})", flush=True)
        amb0 = bench._ambient_snapshot()
        t, s, memo = run_suite(spark, sf_dir)
        result["windows"][tag] = {
            "timings": t,
            "spread_max_minus_min": s,
            "memo_warm": memo,
            "total_s": round(
                sum(v for v in t.values() if v is not None), 3
            ),
            "ambient_load": bench._ambient_load(
                amb0, bench._ambient_snapshot()
            ),
        }
    t1 = result["windows"]["sf0.1"]["timings"]
    t5 = result["windows"]["sf0.5"]["timings"]
    growth = {
        q: (
            round(t5[q] / t1[q], 2)
            if t1.get(q) and t5.get(q) is not None
            else None
        )
        for q in t1
    }
    result["growth_ratio_5x"] = growth
    git_sha, code_sha = bench._shas()
    result["git_sha"], result["code_sha"] = git_sha, code_sha
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(f"\nwrote {out_path}", flush=True)
    worst = sorted(
        ((g, q) for q, g in growth.items() if g is not None), reverse=True
    )[:20]
    print("worst growth at 5x data:")
    for g, q in worst:
        print(f"  {q}: {t1[q]}s -> {t5[q]}s  ({g}x)")
    failed = [q for q, g in growth.items() if g is None]
    if failed:
        print("unmeasured/failed:", failed)


if __name__ == "__main__":
    main()
