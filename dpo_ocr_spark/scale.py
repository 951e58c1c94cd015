"""Scale layer: salted repartition, per-partition lineage, resumability.

north_rule requirements (BASELINE.json:14): partitioning/shuffle/skew
handled explicitly; per-partition lineage rows (partition id, input count,
bytes, checkpoint watermark) written alongside results; failed partition
ranges resumable.

Skew: the corpus deliberately concentrates ~10% of urls on one host
(FIXTURES.md §1).  At 10¹² rows a host-hash partitioning would melt one
executor; we salt on ``xxhash64(url)`` — uniform over urls regardless of
host skew — before the heavy decode stage.  Downstream assembly groups by
url, which is unique per row here, so AQE handles any residual skew
(``spark.sql.adaptive.skewJoin.enabled``).

Resume: lineage is written with results; a restarted job anti-joins its
input against completed lineage partition ids (here) / Iceberg snapshot
watermarks (at real scale) and reprocesses only the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(df: DataFrame, num_partitions: int, key: str = "url") -> DataFrame:
    """Explicit skew-defusing exchange before a heavy narrow stage.

    Hash-repartition on ``xxhash64(key)`` — byte-uniform even when the key
    space is host-skewed (many urls on one host hash apart).  One shuffle,
    after which the expensive decode work is balanced across executors.
    """
    return df.repartition(num_partitions, F.xxhash64(F.col(key)))


def with_lineage(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Attach partition ids and derive the lineage frame (LINEAGE schema).

    Returns (results_with_partition_id, lineage).  Lineage aggregates are
    computed from the same frame in one extra pass — at real scale both
    land in the same Iceberg commit so they are atomic.
    """
    tagged = extracted.withColumn("partition_id", F.spark_partition_id())
    lineage = tagged.groupBy("partition_id").agg(
        F.count("*").alias("input_count"),
        F.sum("n_bytes").alias("input_bytes"),
        F.max("warc_ts").alias("checkpoint_watermark"),
    )
    return tagged, lineage


def resume_filter(pages: DataFrame, lineage_done: DataFrame) -> DataFrame:
    """Re-run predicate: keep only pages whose watermark range is not yet
    covered by completed lineage (anti-join on the checkpoint watermark).

    The reference's analog is delete-by-project + rerun
    (block_identification.py:63); ours is additive and idempotent.
    """
    done_urls = lineage_done.select("url") if "url" in lineage_done.columns else None
    if done_urls is not None:
        return pages.join(done_urls, "url", "left_anti")
    max_wm = lineage_done.agg(F.max("checkpoint_watermark").alias("wm"))
    return pages.join(
        max_wm, pages["warc_ts"] > max_wm["wm"], "left_semi"
    )


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guarantee a frame enters its compute stage with ≥ core-count
    partitions; no-op when the scan already splits enough.

    Why: parquet splits at ROW-GROUP granularity — a single-row-group
    file scans as ONE task, and every downstream narrow stage (JVM or
    Arrow-UDF) inherits that 1-task parallelism. Local fixtures are
    single-group files, so this fires there; at production scale an
    Iceberg table scans as thousands of splits and this is a metadata
    check only (never a 100 TB shuffle)."""
    spark = df.sparkSession
    min_parts = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
