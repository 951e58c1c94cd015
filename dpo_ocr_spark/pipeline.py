"""End-to-end extraction pipeline wiring (SURVEY.md §3.1).

scan → (salted repartition) → Arrow extract → exploded tokens/blocks →
assembly.  Physical shape at scale: parquet/Iceberg scan (pruned) →
round-robin-on-salt exchange → mapInPandas (pipelined, no shuffle) →
one groupBy shuffle for assembly — exactly the two-shuffle plan SURVEY.md
§4 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .assemble import assemble_blocks, explode_tokens
from .corpus import build_web_pages
from .extract import extract_pages
from .scale import salted_repartition


def run_extraction(
    spark: SparkSession,
    sf_dir: str,
    salt_partitions: int | None = None,
) -> DataFrame:
    """documents parquet → EXTRACT_RESULT frame (one row per url)."""
    pages = build_web_pages(spark, sf_dir)
    if salt_partitions:
        pages = salted_repartition(pages, salt_partitions)
    return extract_pages(pages)


def run_block_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: extract every page, assemble confidence-filtered blocks."""
    extracted = run_extraction(spark, sf_dir)
    tokens = explode_tokens(extracted)
    return assemble_blocks(tokens)
