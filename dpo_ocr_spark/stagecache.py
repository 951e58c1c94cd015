"""Shared-stage memo for the correctness-gate harness.

The driver gate and the local oracle sweep run ~95 registered queries at
one sf_dir; around 20 of them re-derive the SAME upstream frames from
scratch (the extraction DAG, the interpret label cascade, the auto-match
dictionaries).  Each query wrapper therefore routes its heavy shared
stage through :func:`shared`, which memoizes a lazily
``localCheckpoint``-ed DataFrame per (SparkSession, key): the first
action materializes the stage once, every later query reuses the
checkpointed blocks instead of re-running the whole DAG.

Values are bit-identical to the uncached path — a checkpoint only
truncates lineage.  Disable with ``SPARK_GRAFT_STAGE_CACHE=0`` (bench.py
does, so per-query timings keep measuring the full pipeline and stay
comparable round-over-round).

This is harness machinery, not a production operator: real jobs write
extraction output once (jobs/run_extract.py) and downstream queries read
the parquet — the memo reproduces that write-once shape inside a
single-session gate run.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_STAGE_CACHE", "1") != "0"


def _session_token(spark: SparkSession) -> str:
    """Session identity that survives nothing: applicationId + startTime.
    ``id(spark)`` is unsafe — CPython reuses ids after GC, so a new
    session could inherit checkpointed frames bound to a dead one (r4
    advice item #2); the (appId, startTime) pair is unique per JVM
    context and never recycled within a process."""
    sc = spark.sparkContext
    return f"{sc.applicationId}:{sc.startTime}"


def shared(
    spark: SparkSession, key: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Memoized, lineage-truncated ``builder()`` per (session, key)."""
    if not enabled():
        return builder()
    tok = _session_token(spark)
    k = (tok, key)
    if k not in _CACHE:
        # evict frames bound to other (dead) sessions so the memo never
        # pins a stopped session's DataFrames for the process lifetime
        for old in [x for x in _CACHE if x[0] != tok]:
            del _CACHE[old]
        _CACHE[k] = builder().localCheckpoint(eager=False)
    return _CACHE[k]


def clear() -> None:
    _CACHE.clear()
