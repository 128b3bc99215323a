"""Session-scoped shared-stage cache for multi-query pipelines.

Several registry queries are stages of ONE pipeline run back-to-back by
the driver in a single session:

- shingle sets  -> minhash -> LSH pairs -> CC groups -> keep-one corpus
- IVF assignment -> embedding near-dup pairs -> semantic dedup
- k-means cells -> ANN top-k -> recall@5 audit (vs the exact top-k)

Rebuilding the common prefix per query wastes the dominant cost (the
md5-heavy shingling, the Lloyd training scans), and the round-2 fix of
calling ``.persist()`` inside one builder leaked: every re-invocation
re-persisted an identical plan (Spark's CacheManager warns "Asked to
cache already cached data") and nothing ever unpersisted, so a
long-lived session accumulated caches.

``stage`` fixes both: each shared stage is persisted exactly once per
(application, stage-name) and re-invocations return the SAME DataFrame
object. The cache holds at most one entry per stage name — building the
same stage with different parameters (another sf_dir, another threshold)
unpersists and replaces the old entry, bounding cache growth at
O(#stage names) for any session lifetime. ``clear`` unpersists
everything (tests / long-running services / before memory-hungry jobs).

At 100 TB the same structure holds — the persisted stages are either
per-doc maps (shingle sets: corpus-sized but MEMORY_AND_DISK, evictable)
or tiny derived tables (near-dup pairs, centroids); on a cluster, set
``SPARK_GRAFT_STAGE_DIR`` (r15, the cluster-safe materialization switch
— companion to materialize.py's SPARK_GRAFT_RELIABLE_CKPT): each stage
is then written to parquet under ``<dir>/<applicationId>/<name>`` on
first use and read back, so executor churn cannot evict it and cache
pressure never competes with execution memory (guide §5). The path is
keyed by applicationId — a fresh run always rebuilds from the inputs
(NO cross-run result reuse; this is durability of a within-session
intermediate, exactly what persist provided, not precomputation).
Local default unchanged: in-memory persist.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

# (app_id, stage_name) -> (params, persisted DataFrame)
_cache: dict[tuple[str, str], tuple[Any, DataFrame]] = {}

# Escape hatch for plan audits: when True, builders run un-persisted and
# un-memoized so `.explain` shows every stage's full physical plan
# instead of an InMemoryTableScan over an already-cached prefix.
DISABLE = False


def stage(
    spark: SparkSession,
    name: str,
    params: Any,
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Return the persisted shared stage ``name``, building it on first use.

    ``params`` identifies the build inputs (sf_dir + tuning knobs); a
    call with different params rebuilds and replaces the cached entry
    (the old one is unpersisted — blocking=False, eviction is async).
    """
    if DISABLE:
        return builder()
    key = (spark.sparkContext.applicationId, name)
    hit = _cache.get(key)
    if hit is not None and hit[0] == params:
        return hit[1]
    if hit is not None:
        _drop(key)
    stage_dir = os.environ.get("SPARK_GRAFT_STAGE_DIR")
    if stage_dir:
        # Cluster mode: parquet-materialize the stage (survives executor
        # loss, no cache pressure). Session-scoped path — a rebuild with
        # different params overwrites it; a new application rebuilds.
        safe = re.sub(r"[^A-Za-z0-9_.-]", "_", name)
        path = os.path.join(stage_dir, spark.sparkContext.applicationId, safe)
        builder().write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
    else:
        df = builder().persist(StorageLevel.MEMORY_AND_DISK)
    _cache[key] = (params, df)
    return df


def plan(
    spark: SparkSession,
    name: str,
    params: Any,
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Memoize a query's ANALYZED LOGICAL PLAN per session and return a
    FRESH Dataset over it on every call — the prepared-statement
    contract. Motivation (r15, measured): building the WAND retrieval
    DAG costs 1.5–2 s of py4j round-trips (2,122 gateway calls) PER REP
    — pure driver-side re-construction of an identical plan.

    Returning the SAME DataFrame object would be faster still, but
    dishonestly so: a re-collected DataFrame reuses its QueryExecution's
    materialized AQE shuffle stages, so repeat runs skip nearly all
    execution (measured: tbl_profile_lineitem 2.7 s fresh vs 0.085 s
    same-object) — result caching in disguise. ``Dataset.ofRows`` over
    the cached analyzed plan creates a new QueryExecution each call:
    every exchange re-executes, only the Python-side construction is
    skipped. Same keying/replacement semantics as :func:`stage`;
    entries share the cache and are dropped by :func:`clear`."""
    if DISABLE:
        return builder()
    key = (spark.sparkContext.applicationId, "plan:" + name)
    hit = _cache.get(key)
    if hit is not None and hit[0] == params:
        cached = hit[1]
    else:
        if hit is not None:
            _drop(key)
        cached = builder()
        _cache[key] = (params, cached)
    jplan = cached._jdf.queryExecution().analyzed()
    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def _drop(key: tuple[str, str]) -> None:
    # best-effort: the entry's SparkContext may already be stopped (a
    # recreated session gets a new applicationId); the dict entry must
    # go regardless, and a dead context's unpersist must not abort the
    # caller's loop.
    df = _cache.pop(key)[1]
    try:
        df.unpersist()
    except Exception:
        pass


def clear(spark: SparkSession | None = None) -> None:
    """Unpersist and drop every cached stage (of one app, or all —
    including entries whose SparkContext has since been stopped)."""
    app = spark.sparkContext.applicationId if spark is not None else None
    for key in list(_cache):
        if app is None or key[0] == app:
            _drop(key)
