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

_CACHE: dict[tuple[int, str], DataFrame] = {}


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_STAGE_CACHE", "1") != "0"


def shared(
    spark: SparkSession, key: str, builder: Callable[[], DataFrame]
) -> DataFrame:
    """Memoized, lineage-truncated ``builder()`` per (session, key)."""
    if not enabled():
        return builder()
    k = (id(spark), key)
    if k not in _CACHE:
        _CACHE[k] = builder().localCheckpoint(eager=False)
    return _CACHE[k]


def clear() -> None:
    _CACHE.clear()
