"""Pipeline-scoped cache pool for data-sized persisted intermediates.

The dedup/ANN pipelines persist data-sized relations eagerly (minhash
shingles + signatures, simhash signatures, PQ residual subvectors) because
their DAGs are diamonds — several consumers, and exchange reuse does not
fire across those join shapes (ROADMAP invariants). But ``persist`` pins
executor block-manager memory until ``unpersist`` or session end, and a
long-lived session running many queries ACCUMULATES pinned blocks from
every pipeline it ever ran (round-3 verdict item).

This pool bounds that: each pipeline invocation calls ``begin_pipeline()``
first, which releases every intermediate the PREVIOUS invocation tracked
via ``eager_cache``. At most one pipeline's intermediates are pinned at a
time, and session owners can drop those too with ``release()``.

Why eviction-at-next-entry instead of unpersist-on-return: the registered
queries RETURN lazy DataFrames whose plans read the cached relations — the
consumer (driver, bench harness, user) executes them after the builder
returns, so in-builder unpersist would defeat the persist. Releasing on
the next pipeline entry keeps the current query's cache alive exactly as
long as it is plausibly needed.

Correctness is unaffected either way: ``persist`` is advisory — a plan
whose cached relation was released silently recomputes from lineage (this
is also why the pool is safe if a session interleaves two pipelines: the
second evicts the first's cache and the first's DataFrame, if re-executed,
just recomputes). ``localCheckpoint`` relations are NOT tracked here —
checkpointing truncates lineage, so releasing those blocks would lose the
only copy.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_LOG = logging.getLogger(__name__)
_PLAN_ONLY_WARNED = False


def _plan_only() -> bool:
    # SPARK_GRAFT_PLAN_ONLY=1 turns both cache helpers into no-ops: used
    # by bench.py's plan-fingerprint pass, which builds every registered
    # DataFrame WITHOUT executing it — an eager fill there would re-run
    # every pipeline's materialization jobs just to read a plan string,
    # and a persist marker would swap InMemoryRelation into the optimized
    # plan, making the fingerprint depend on cache state instead of code.
    #
    # Warn ONCE when the flag actually suppresses a persist (ADVICE r9):
    # if the env var leaks into a real run (exported shell, a harness
    # crashing before cleanup), every pipeline silently loses its
    # diamond-DAG caching — this line is the signal that turns "mysterious
    # slowdown" into a one-grep diagnosis.
    active = os.environ.get("SPARK_GRAFT_PLAN_ONLY") == "1"
    global _PLAN_ONLY_WARNED
    if active and not _PLAN_ONLY_WARNED:
        _PLAN_ONLY_WARNED = True
        _LOG.warning(
            "SPARK_GRAFT_PLAN_ONLY=1: suppressing pipeline persists "
            "(plan-fingerprint mode). If this is a real run, unset the "
            "env var — every diamond-DAG cache is a no-op right now."
        )
    elif not active:
        _PLAN_ONLY_WARNED = False  # re-arm if the flag is cleared and re-set
    return active


def begin_pipeline() -> None:
    """Mark a pipeline entry: release intermediates from prior pipelines."""
    release()


def eager_cache(df: DataFrame) -> DataFrame:
    """Persist MEMORY_AND_DISK, eagerly fill (one count() up front — lazy
    caches are raced by concurrent stages of the first consuming job and
    each racer recomputes the pipeline), and track for release at the next
    ``begin_pipeline()``."""
    if _plan_only():
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    _TRACKED.append(df)
    return df


def lazy_cache(df: DataFrame) -> DataFrame:
    """Persist MEMORY_AND_DISK and track, WITHOUT the eager fill — for
    relations whose first consumer is a single sequential job (no
    concurrent-stage fill race), where an extra materialization job would
    only add latency."""
    if _plan_only():
        return df
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED.append(df)
    return df


def release() -> None:
    """Unpersist every tracked intermediate (non-blocking)."""
    while _TRACKED:
        _TRACKED.pop().unpersist()
