"""Event-stream relational operators: as-of join and sessionization.

Two operators every log/event pipeline needs that plain equi-joins can't
express, built in the shapes that survive 100 TB:

- **as-of join** (``asof_join``): each event is matched to the latest
  order at-or-before its timestamp for the same user.  NOT implemented as
  a range join (which explodes to |events|×|orders per user| before
  filtering) — instead the classic union-and-carry form: union both
  sides tagged, one window per user ordered by time carries the most
  recent order forward with ``last(..., ignorenulls=True)``.  Exactly one
  shuffle (hash on user_id), per-row state is O(1), no fan-out at any
  scale.  Skewed users are AQE-handled; the window frame is streaming
  (rows between unbounded preceding and current), so no partition-sized
  buffering.
- **sessionization** (``sessionize``): gap-based sessions (new session
  when > GAP_S since the previous event of the same user), the standard
  lag → boundary flag → running-sum pattern.  The follow-up groupBy is on
  (user_id, session_id): Spark recognizes the existing hash partitioning
  on user_id as satisfying the clustered distribution, so the aggregate
  reuses the window's exchange — one shuffle total (pinned in
  tests/test_plans.py).

Determinism/oracle contract: timestamps are compared and emitted as epoch
MICROSECONDS (int64) — `unix_micros` here, `epoch_us` in DuckDB — so the
hash gate never sees engine-specific timestamp stringification; money is
BIGINT ten-thousandths per the repo-wide rule.  As-of ties (two orders
with identical o_orderdate for one user) break to the larger o_orderkey
via the window sort key, mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

GAP_S = 1800  # session gap threshold (seconds)


def _epoch_us(col: str) -> F.Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-independent
    (the parquet tables carry NTZ; `unix_micros` would re-interpret in the
    session zone — TIMESTAMPDIFF against the NTZ epoch does not)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⟕asof orders on user_id, o_orderdate <= ts (latest wins).

    Returns (event_id, user_id, ts_us, o_orderkey, o_total_e4) with NULL
    order columns for events preceding the user's first order.
    """
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        _epoch_us("ts").alias("t_us"),
        F.lit(1).alias("is_left"),
        "event_id",
        F.lit(None).cast("long").alias("r_orderkey"),
        F.lit(None).cast("long").alias("r_total_e4"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        _epoch_us("o_orderdate").alias("t_us"),
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("r_orderkey"),
        F.floor(F.col("o_totalprice") * 10000.0 + 0.5).alias("r_total_e4"),
    )
    # at equal t_us the order row sorts first (is_left=0) => at-or-before;
    # among equal-time orders the larger orderkey sorts last => wins.
    w = (
        W.partitionBy("k")
        .orderBy("t_us", "is_left", F.coalesce("r_orderkey", F.lit(-1)))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = ev.unionByName(orders).select(
        "*",
        F.last("r_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("r_total_e4", ignorenulls=True).over(w).alias("o_total_e4"),
    )
    return carried.filter(F.col("is_left") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t_us").alias("ts_us"),
        "o_orderkey",
        "o_total_e4",
    )


ASOF_ORACLE = """
WITH u AS (
  SELECT user_id AS k, epoch_us(ts) AS t_us, 1 AS is_left, event_id,
         NULL::BIGINT AS r_orderkey, NULL::BIGINT AS r_total_e4
  FROM events
  UNION ALL
  SELECT o_custkey, epoch_us(o_orderdate), 0, NULL,
         o_orderkey,
         CAST(floor(o_totalprice * 10000.0 + 0.5) AS BIGINT)
  FROM orders
), c AS (
  SELECT *,
         last_value(r_orderkey IGNORE NULLS) OVER w AS o_orderkey,
         last_value(r_total_e4 IGNORE NULLS) OVER w AS o_total_e4
  FROM u
  WINDOW w AS (PARTITION BY k
               ORDER BY t_us, is_left, coalesce(r_orderkey, -1)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, k AS user_id, t_us AS ts_us, o_orderkey, o_total_e4
FROM c WHERE is_left = 1
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions over events (gap > GAP_S starts a new session).

    Returns one row per (user_id, session_id) with integer-exact bounds:
    (user_id, session_id, start_us, end_us, n_events, duration_s).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", _epoch_us("ts").alias("t_us")
    )
    wo = W.partitionBy("user_id").orderBy("t_us")
    flagged = ev.select(
        "*",
        F.when(
            F.lag("t_us").over(wo).isNull()
            | (F.col("t_us") - F.lag("t_us").over(wo) > GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "t_us",
        F.sum("is_new")
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("t_us").alias("start_us"),
        F.max("t_us").alias("end_us"),
        F.count("*").alias("n_events"),
        # integer floor-div in BOTH engines (`div` here, `//` in DuckDB):
        # no double round-trip in an oracle-hashed column
        F.expr("(max(t_us) - min(t_us)) div 1000000").alias("duration_s"),
    )


SESSIONIZE_ORACLE = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS t_us FROM events
), flagged AS (
  SELECT user_id, t_us,
         CASE WHEN lag(t_us) OVER w IS NULL
                   OR t_us - lag(t_us) OVER w > {GAP_S} * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
), sess AS (
  SELECT user_id, t_us,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       MIN(t_us) AS start_us, MAX(t_us) AS end_us,
       COUNT(*) AS n_events,
       (MAX(t_us) - MIN(t_us)) // 1000000 AS duration_s
FROM sess GROUP BY user_id, session_id
"""


def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-statistic quantiles (p50/p90/p99) of event value per
    event_type — element at rank ceil(q·n) of floor(value·100) integers,
    NO interpolation, so the result is the multiset order statistic and
    both engines hash identically regardless of tie order.

    Scale note: one window per event_type means one reducer per group —
    correct while group count ≫ cores or groups fit a task (they do for
    enum-like keys at any corpus size ONLY if per-group rows fit one
    task's sort spill; for billion-row groups use percentile_approx or a
    two-phase per-partition-histogram merge; this exact form is the
    verifier/oracle twin).
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    w = W.partitionBy("event_type").orderBy("v")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    pick = lambda num, den: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.expr(f"({num} * n + {den - 1}) div {den}"),
            F.col("v"),
        )
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        pick(1, 2).alias("p50_x100"),
        pick(9, 10).alias("p90_x100"),
        pick(99, 100).alias("p99_x100"),
    )


VALUE_QUANTILES_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v FROM events
), ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
SELECT event_type, MAX(n) AS n_events,
       MAX(CASE WHEN rn = (1 * n + 1) // 2 THEN v END) AS p50_x100,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90_x100,
       MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS p99_x100
FROM ranked GROUP BY event_type
"""


def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON props column with a
    TYPED from_json schema (not get_json_object string-plucking — the
    typed parse lets Catalyst prune and vectorize), then aggregate per
    extracted key: one groupBy shuffle.  Output integer-exact
    (floor(value·100) sums)."""
    ev = _t(spark, sf_dir, "events").select(
        F.from_json("props", "k int").getField("k").alias("k"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    return ev.groupBy("k").agg(
        F.count("*").alias("n_events"),
        F.sum("v").alias("value_x100_sum"),
    )


PROPS_EXTRACT_ORACLE = """
SELECT CAST(props->>'k' AS INT) AS k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS value_x100_sum
FROM events GROUP BY 1
"""


def cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional CUBE aggregate over events: counts + integer
    value sums for every (event_type, value_bucket) combination including
    both marginals and the grand total — the OLAP companion to
    rollup_summary (which covers the hierarchical ROLLUP form).  NULL
    grouping columns are replaced by 'ALL' sentinels so the hash gate
    never compares engine NULL-ordering."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.floor(F.col("value") / 25).cast("int")).alias("value_bucket"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    out = ev.cube("event_type", "value_bucket").agg(
        F.count("*").alias("n_events"),
        F.sum("v").alias("value_x100_sum"),
    )
    return out.select(
        F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("value_bucket").cast("string"), F.lit("ALL")).alias(
            "value_bucket"
        ),
        "n_events",
        "value_x100_sum",
    )


CUBE_SUMMARY_ORACLE = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(value / 25) AS INT) AS value_bucket,
         CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(value_bucket AS VARCHAR), 'ALL') AS value_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(v) AS BIGINT) AS value_x100_sum
FROM ev GROUP BY CUBE (event_type, value_bucket)
"""
