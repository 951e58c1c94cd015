#!/usr/bin/env python3
"""Production job entry point (spark-submit shape, north_star).

Ship as::

    python jobs/make_pyfiles.py          # → dist/dpo_ocr_spark.zip
    spark-submit --py-files dist/dpo_ocr_spark.zip jobs/run_extract.py \
        --input  /path/to/web_pages_parquet_or_iceberg \
        --output /path/to/results \
        --lineage /path/to/lineage \
        --resume-from /path/to/lineage_completed   # optional
        --salt-partitions 4096

Pipeline: scan → (resume anti-join) → salted repartition → Arrow decode →
write results + per-partition lineage rows (partition id, input count,
bytes, checkpoint watermark) in the same run — the failed-range-resume
contract of the north rule.  On a real cluster --salt-partitions sizes
each task at ~128 MB of payload.
"""

from __future__ import annotations

import argparse


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--salt-partitions", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from dpo_ocr_spark.extract import extract_pages
    from dpo_ocr_spark.scale import resume_filter, salted_repartition, with_lineage

    spark = SparkSession.builder.getOrCreate()  # conf comes from spark-submit
    pages = spark.read.parquet(args.input)
    if args.resume_from:
        done = spark.read.parquet(args.resume_from)
        pages = resume_filter(pages, done)
    parts = args.salt_partitions or spark.sparkContext.defaultParallelism * 2
    pages = salted_repartition(pages, parts)
    extracted = extract_pages(pages)
    results, lineage = with_lineage(extracted)
    results.write.mode("append").parquet(args.output)
    lineage.write.mode("append").parquet(args.lineage)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
