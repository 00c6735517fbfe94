"""Per-corpus memo store: parquet-backed "fit once, serve many" artifacts.

Iterative per-corpus artifacts — BFS hop tables, single-linkage labels,
the persisted IVF index layout — are computed once per corpus VERSION
and served from disk afterwards. The memo path is a pure function of
the memo tag plus the source tables' identity fingerprint (file size +
mtime under the sf_dir), so:

- a fresh process (the driver bench, a new judge session) RELOADS the
  settled artifact instead of rebuilding — steady-state cost is a
  (possibly partition-pruned) parquet read, and the bench can itemize
  build vs probe honestly;
- regenerating the test data invalidates the memo automatically (the
  fingerprint changes → a new path);
- caching a PATH rather than a DataFrame means nothing dies with the
  SparkSession that built it: `localCheckpoint` blocks are
  session-scoped, parquet files are not. (A DataFrame memo keyed only
  by sf_dir returned dead plans to later sessions in the same process.)

Builds are atomic: write into a pid-suffixed tmp dir, `os.rename` into
place. Concurrent builders race benignly — one rename wins, the loser
discards its tmp and reads the winner's artifact.

At 100 TB the same contract holds with the scratch root pointed at the
shared filesystem / object store the cluster already uses for shuffle
spill or checkpoints; the fingerprint generalizes to the table's
snapshot/commit id instead of local stat().
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")

# build seconds observed by THIS process, keyed by memo tag; 0.0 when the
# artifact was already on disk. bench.py reads this to itemize
# once-per-corpus build cost separately from steady-state probe medians.
BUILD_SECONDS: dict[str, float] = {}

# (session id, memo path) -> served DataFrame plan (see dataframe_memo)
_READ_PLAN_CACHE: dict[tuple[int, str], DataFrame] = {}


def corpus_fingerprint(sf_dir: str, tables: Sequence[str]) -> str:
    """Identity of the source tables: name + size + mtime_ns per file
    (recursing into directory-style parquet). Any regeneration of the
    test data changes this, which changes the memo path."""
    parts: list[str] = []
    for t in sorted(tables):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _dirs, files in sorted(os.walk(p)):
                for fname in sorted(files):
                    st = os.stat(os.path.join(root, fname))
                    parts.append(f"{t}/{fname}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def memo_path(
    tag: str, sf_dir: str, tables: Sequence[str], version: int = 1
) -> str:
    """Deterministic per-(tag, corpus-version) directory under SCRATCH.
    The corpus NAME is part of the basename (not just the fingerprint
    hash) so stale-version pruning never crosses corpora — sf0.001
    (tests), sf0.01 (oracle gate) and sf0.1 (bench) memos coexist."""
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{corpus_fingerprint(sf_dir, tables)}"
        f"|v{version}".encode()
    ).hexdigest()[:12]
    corpus = os.path.basename(os.path.abspath(sf_dir).rstrip("/")) or "corpus"
    return os.path.join(SCRATCH, "memo", f"{tag}_{corpus}_{key}")


def is_ready(path: str, markers: Sequence[str] = ("_SUCCESS",)) -> bool:
    return all(os.path.isfile(os.path.join(path, m)) for m in markers)


def _promote(tmp: str, path: str) -> None:
    """Atomic tmp→final rename; losing a race to another builder is fine."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        os.rename(tmp, path)
    except OSError:
        if os.path.exists(path):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    _prune_stale(path)


def _prune_stale(keep_path: str) -> None:
    """Drop sibling memos of the same tag built against OLD corpus
    fingerprints (testdata regeneration changes the hash, so superseded
    artifacts would otherwise accumulate forever). Best-effort: a
    concurrent reader of a stale memo only exists if it is mid-migration
    across corpus versions, which the fingerprint contract already
    declares undefined."""
    parent, base = os.path.split(keep_path)
    tag = base.rsplit("_", 1)[0]
    try:
        siblings = os.listdir(parent)
    except OSError:
        return
    for d in siblings:
        if (
            d.startswith(f"{tag}_")
            and d != base
            and not d.startswith(f"{base}.tmp")
            and d.rsplit("_", 1)[0] == tag
        ):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def dataframe_memo(
    spark: SparkSession,
    tag: str,
    sf_dir: str,
    tables: Sequence[str],
    build: Callable[[], DataFrame],
    version: int = 1,
) -> DataFrame:
    """Serve `build()`'s result from a per-corpus parquet memo.

    On miss: run the (possibly iterative, checkpoint-heavy) build once,
    persist the SETTLED frame, and serve the parquet read — so every
    later caller, in any process or SparkSession, pays only the read.
    """
    path = memo_path(tag, sf_dir, tables, version=version)
    key = (id(spark), path)
    if not is_ready(path):
        t0 = time.perf_counter()
        tmp = f"{path}.tmp.{os.getpid()}"
        build().write.mode("overwrite").parquet(tmp)
        _promote(tmp, path)
        BUILD_SECONDS[tag] = round(time.perf_counter() - t0, 3)
        # a rebuild means the dir was wiped mid-session: any plan cached
        # BEFORE the wipe lists the deleted part files — evict it
        _READ_PLAN_CACHE.pop(key, None)
    else:
        BUILD_SECONDS.setdefault(tag, 0.0)
    # plan cache, same rationale as sources.registry._PLAN_CACHE: the
    # read plan costs a parquet-footer pass + a py4j analysis round-trip
    # per call. No staleness hazard in the steady state — the memo PATH
    # embeds the source-corpus fingerprint, so a regenerated corpus is a
    # different path, and a wiped-and-rebuilt dir evicts above.
    cached = _READ_PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    _READ_PLAN_CACHE[key] = df
    return df


def clear_plan_cache(spark: SparkSession | None = None) -> int:
    """Drop memo read-plan cache entries — all of them, or one session's
    (same hook `sources.registry.clear_plan_cache` provides for the
    table-plan cache; without it, entries pin stopped SparkSessions).
    Returns the number of entries dropped."""
    if spark is None:
        n = len(_READ_PLAN_CACHE)
        _READ_PLAN_CACHE.clear()
        return n
    keys = [k for k in _READ_PLAN_CACHE if k[0] == id(spark)]
    for k in keys:
        del _READ_PLAN_CACHE[k]
    return len(keys)


def layout_memo(
    tag: str,
    sf_dir: str,
    tables: Sequence[str],
    build: Callable[[str], None],
    markers: Sequence[str],
    version: int = 1,
) -> str:
    """Serve a multi-directory on-disk LAYOUT (e.g. the IVF index:
    `buckets/` hive-partitioned corpus + `centroids/`) from the memo.
    `build(tmp_path)` writes the layout into tmp; `markers` are the
    layout-relative files whose presence means "complete"."""
    path = memo_path(tag, sf_dir, tables, version=version)
    if not is_ready(path, markers):
        t0 = time.perf_counter()
        tmp = f"{path}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build(tmp)
        _promote(tmp, path)
        BUILD_SECONDS[tag] = round(time.perf_counter() - t0, 3)
    else:
        BUILD_SECONDS.setdefault(tag, 0.0)
    return path
