"""Structured Streaming wrapper: stream result ≡ batch result."""

from __future__ import annotations

SD = "/root/testdata/sf0.001"


def test_stream_equals_batch(tmp_path, spark):
    from dpo_ocr_spark.corpus import build_web_pages
    from dpo_ocr_spark.pipeline import run_extraction
    from dpo_ocr_spark.streaming.stream import stream_extract

    src = str(tmp_path / "src")
    build_web_pages(spark, SD, partitions=4).write.parquet(src)
    stream_extract(spark, src, str(tmp_path / "ckpt"), "t_stream")
    got = sorted(
        (r.url, r.text) for r in spark.table("t_stream").select("url", "text").collect()
    )
    want = sorted(
        (r.url, r.text)
        for r in run_extraction(spark, SD).select("url", "text").collect()
    )
    assert got == want  # byte-identical text through the streaming path


def test_late_page_counts_shape(spark):
    from dpo_ocr_spark.corpus import build_web_pages
    from dpo_ocr_spark.streaming.stream import late_page_counts

    # watermark API works on batch frames too (no-op) — shape check
    out = late_page_counts(build_web_pages(spark, SD, partitions=4)).collect()
    assert sum(r.n_pages for r in out) == 500
    assert all(r.start is not None and r.lang for r in out)


def test_stateful_dedup_across_restarts(tmp_path, spark):
    """applyInPandasWithState first-seen dedup: each url emitted exactly
    once across micro-batches AND across checkpoint restarts."""
    from pyspark.sql import functions as F

    from dpo_ocr_spark.corpus import build_web_pages
    from dpo_ocr_spark.streaming.stream import stream_dedup_extract

    pages = build_web_pages(spark, SD, partitions=4)
    did = F.substring("url", -6, 6).cast("int")
    src = str(tmp_path / "src")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    # phase 1: docs 0..49
    pages.filter(did < 50).write.mode("append").parquet(src)
    stream_dedup_extract(spark, src, ckpt, sink)
    n1 = spark.read.parquet(sink).count()
    assert n1 == 50

    # phase 2: docs 25..74 appended as NEW files — 25..49 are duplicates
    # the state store must drop after the restart
    pages.filter((did >= 25) & (did < 75)).write.mode("append").parquet(src)
    stream_dedup_extract(spark, src, ckpt, sink)
    out = spark.read.parquet(sink)
    assert out.count() == 75
    assert out.select("url").distinct().count() == 75
