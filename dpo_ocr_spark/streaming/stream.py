"""Structured Streaming wrapper over the extraction stage (SURVEY.md §2.9).

The reference is strictly batch (incremental batches via doc_version CLI
args, run_gvision_ocr.py:54-64); this thin wrapper is the stretch-goal
re-expression: the SAME ``extract_pages`` transformation runs as a
micro-batch stream with ``Trigger.AvailableNow`` (drain-everything-then-
stop — the modern incremental-batch idiom), plus a watermarked windowed
count on ``warc_ts`` for late-page monitoring.

No stateful custom operators are required by the reference's semantics;
resumability remains checkpoint-based (the stream checkpoint plays the
role Iceberg snapshots play in the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..extract import extract_pages
from ..schemas import WEB_PAGES


def stream_extract(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    sink_table: str = "stream_extracted",
    sink_dir: str | None = None,
) -> None:
    """Drain ``source_dir`` (parquet, WEB_PAGES schema) through the
    extraction stage, exactly-once per file via the checkpoint; returns
    after completion (AvailableNow).

    ``sink_dir`` set → durable parquet sink: this is the resumable path
    (re-running with the same checkpoint processes only new files — the
    memory sink CANNOT recover from a checkpoint, verified empirically,
    so it is only offered for ad-hoc inspection with a fresh checkpoint).
    """
    pages = (
        spark.readStream.schema(WEB_PAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    extracted = extract_pages(pages)
    writer = extracted.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).trigger(availableNow=True)
    if sink_dir is not None:
        q = writer.format("parquet").option("path", sink_dir).start()
    else:
        q = writer.format("memory").queryName(sink_table).start()
    q.awaitTermination()


def late_page_counts(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked per-hour page counts (late-data monitoring shape)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select("w.start", "w.end", "lang", "n_pages")
    )
