"""Physical-plan regression gates (the cheap subset of tools/explain_plans.py).

These fail loudly if a future change silently breaks predicate pushdown,
column pruning, or broadcast-dim selection — the plan properties the
100 TB story depends on.
"""

from __future__ import annotations

SD = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()  # AQE finalizes the executed plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    import __spark_entry__ as E

    p = _plan(E.queries()["filter_scan"](spark, SD))
    assert "GreaterThan(value,50.0)" in p  # predicate reached parquet
    assert (
        "ReadSchema: struct<event_id:bigint,user_id:bigint,"
        "event_type:string,value:double>" in p
    )  # scan reads exactly the projected + filter columns


def test_small_dims_broadcast(spark):
    import __spark_entry__ as E

    p = _plan(E.queries()["multiway_join"](spark, SD))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # no dim should fall back to SMJ
